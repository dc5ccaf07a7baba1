"""Experiment logging: TensorBoard scalars + policy checkpoints + images.

Reference: fluidlab/utils/logger.py:8-65.  TensorBoard writing uses
torch.utils.tensorboard when available, else falls back to a JSONL file so
headless runs always record their curves.
"""

from __future__ import annotations

import json
import os
import pickle as pkl
import time


class Logger:
    def __init__(self, exp_name):
        self.exp_name = exp_name
        base = os.path.join(os.getcwd(), "logs")
        self.tb_dir = os.path.join(base, "tb", exp_name)
        self.policy_dir = os.path.join(base, "policies", exp_name)
        self.img_dir = os.path.join(base, "imgs", exp_name)
        for d in (self.tb_dir, self.policy_dir, self.img_dir):
            os.makedirs(d, exist_ok=True)

        self._writer = None
        try:
            from torch.utils.tensorboard import SummaryWriter

            self._writer = SummaryWriter(self.tb_dir)
        except Exception:
            pass
        self._jsonl = open(os.path.join(self.tb_dir, "scalars.jsonl"), "a")
        self._last_time = time.time()

    def log(self, iteration, info: dict):
        scalars = {
            k: float(v)
            for k, v in info.items()
            if isinstance(v, (int, float)) or hasattr(v, "item")
        }
        if self._writer is not None:
            for k, v in scalars.items():
                self._writer.add_scalar(k, v, iteration)
        now = time.time()
        scalars["iteration"] = iteration
        scalars["dt"] = now - self._last_time
        self._last_time = now
        self._jsonl.write(json.dumps(scalars) + "\n")
        self._jsonl.flush()

    def save_policy(self, policy, iteration):
        path = os.path.join(self.policy_dir, f"{iteration:04d}.pkl")
        with open(path, "wb") as f:
            pkl.dump(policy, f)

    def write_img(self, img, iteration, step):
        try:
            from PIL import Image

            Image.fromarray(img).save(
                os.path.join(self.img_dir, f"{iteration:04d}_{step:04d}.png")
            )
        except ImportError:
            pass

    def close(self):
        if self._writer is not None:
            self._writer.close()
        self._jsonl.close()
