"""Asset path helpers (reference fluidlab/utils/misc.py get_src_dir etc.)."""

from __future__ import annotations

import os

_PKG_DIR = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def get_src_dir():
    return _PKG_DIR


def get_tgt_path(name):
    d = os.path.join(_PKG_DIR, "assets", "targets")
    os.makedirs(d, exist_ok=True)
    return os.path.join(d, name)


def get_log_dir(exp_name):
    d = os.path.join(os.getcwd(), "logs", exp_name)
    os.makedirs(d, exist_ok=True)
    return d
