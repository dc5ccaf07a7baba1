"""Context-manager stopwatch (reference fluidlab/utils/timer.py:3-13)."""

from __future__ import annotations

import time


class Timer:
    def __init__(self, name="timer", verbose=True):
        self.name = name
        self.verbose = verbose
        self.elapsed = 0.0

    def __enter__(self):
        self.start = time.perf_counter()
        return self

    def __exit__(self, *exc):
        self.elapsed = time.perf_counter() - self.start
        if self.verbose:
            print(f"[{self.name}] {self.elapsed:.4f}s")
        return False
