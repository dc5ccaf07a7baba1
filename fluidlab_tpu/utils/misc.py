"""Small host-side helpers (reference fluidlab/utils/misc.py)."""

from __future__ import annotations

import ast
import random

import numpy as np


def eval_str(x):
    """Parse tuples written as strings in yaml configs (reference
    utils/misc.py:19-23), via ast.literal_eval for safety."""
    if isinstance(x, str):
        return ast.literal_eval(x)
    return x


def set_random_seed(seed: int):
    random.seed(seed)
    np.random.seed(seed)
