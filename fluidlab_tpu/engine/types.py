"""Functional simulation state pytrees.

The reference materializes a whole substep window of particle/grid state as
Taichi fields because its autodiff needs a tape (reference
mpm_simulator.py:73-117).  Here the tape comes from ``lax.scan`` +
``jax.checkpoint``, so state is a single pytree threaded through the scanned
substep function — no frame axis, no window bookkeeping, ~900 fewer lines of
checkpoint plumbing (reference mpm_simulator.py:777-912 collapses into a
remat policy).
"""

from __future__ import annotations

from typing import Any, Optional, Tuple

import jax.numpy as jnp
from flax import struct


@struct.dataclass
class ParticleState:
    """Per-particle dynamic state (reference particle_state struct,
    mpm_simulator.py:75-88).

    SoA/component-major layout: the particle axis is MINOR so TPU (8, 128)
    lane tiling packs fully (trailing (N, 3) layouts pad 3 -> 128 lanes =
    42x HBM traffic; see core/mat3.py)."""

    x: jnp.ndarray  # (3, N) position
    v: jnp.ndarray  # (3, N) velocity
    C: jnp.ndarray  # (9, N) affine velocity field (APIC), row-major
    F: jnp.ndarray  # (9, N) deformation gradient, row-major
    used: jnp.ndarray  # (N,) bool activation mask (particles_ng.used)


@struct.dataclass
class EffectorState:
    """Single effector dynamic state (reference effector.py:34-41 plus the
    injector cursor injector.py:29 and AirCon scalars aircon.py:21-22).

    Unused channels (e.g. ``s``/``r`` for a plain rigid effector) are kept
    at zero: a few scalars cost nothing and a uniform pytree keeps the scan
    carry structure static.
    """

    pos: jnp.ndarray  # (3,)
    quat: jnp.ndarray  # (4,) wxyz
    v: jnp.ndarray  # (3,) per-substep linear displacement
    w: jnp.ndarray  # (3,) per-substep angular displacement (axis-angle)
    s: jnp.ndarray  # () aircon strength
    r: jnp.ndarray  # () aircon radius
    act_id: jnp.ndarray  # () int32 injector pool cursor


@struct.dataclass
class SmokeState:
    """Eulerian smoke state (reference smoke_field.py:62-68).  ``v_tmp``
    and ``div`` are substep intermediates, not state; only v, q, p
    persist.  Channel-major layout (lane-packed scalar grids)."""

    v: jnp.ndarray  # (3, R, R, R)
    q: jnp.ndarray  # (q_dim, R, R, R)
    p: jnp.ndarray  # (R, R, R) pressure (warm start for Jacobi)


@struct.dataclass
class SimState:
    """Full simulation state carried through the scan."""

    particles: Optional[ParticleState]
    effectors: Tuple[EffectorState, ...]
    smoke: Optional[SmokeState]
    f_global: jnp.ndarray  # () int32 global substep counter


def init_effector_state(init_pos, init_quat, dtype=jnp.float32) -> EffectorState:
    return EffectorState(
        pos=jnp.asarray(init_pos, dtype=dtype),
        quat=jnp.asarray(init_quat, dtype=dtype),
        v=jnp.zeros(3, dtype=dtype),
        w=jnp.zeros(3, dtype=dtype),
        s=jnp.zeros((), dtype=dtype),
        r=jnp.ones((), dtype=dtype),  # radius in exp(-d/r); avoid div-by-zero
        act_id=jnp.zeros((), dtype=jnp.int32),
    )


def tree_select(pred, a: Any, b: Any):
    """Elementwise jnp.where over matching pytrees."""
    import jax

    return jax.tree_util.tree_map(lambda x, y: jnp.where(pred, x, y), a, b)
