"""Multi-host orchestration helpers.

The reference is single-process/single-GPU (reference taichi_env.py:12);
this module provides the multi-host runtime the TPU framework needs
(SURVEY.md §2.13.5): `jax.distributed` initialization, a host+rollout
mesh, and deterministic per-host scene construction (scene building is
already bit-reproducible across hosts because body sampling pins seed 0,
engine/bodies.py).
"""

from __future__ import annotations

from typing import Optional

import jax
import numpy as np
from jax.sharding import Mesh


def initialize_distributed(
    coordinator_address: Optional[str] = None,
    num_processes: Optional[int] = None,
    process_id: Optional[int] = None,
):
    """Initialize the JAX distributed runtime on a multi-host pod slice.

    On Cloud TPU the arguments are auto-detected; on other clusters pass
    them explicitly.  Safe to call when already initialized.
    """
    try:
        jax.distributed.initialize(
            coordinator_address=coordinator_address,
            num_processes=num_processes,
            process_id=process_id,
        )
    except RuntimeError as e:  # already initialized
        if "already" not in str(e):
            raise


def make_host_rollout_mesh() -> Mesh:
    """2-D mesh (host, rollout): rollouts data-parallel within each host's
    chips (ICI); the host axis only sees collectives at MPC iteration
    boundaries (DCN) — the layout BASELINE.json prescribes."""
    devices = np.asarray(jax.devices())
    n_local = jax.local_device_count()
    n_hosts = devices.size // n_local
    return Mesh(devices.reshape(n_hosts, n_local), ("host", "rollout"))


def is_primary_host() -> bool:
    return jax.process_index() == 0
