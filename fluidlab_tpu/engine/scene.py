"""Scene parameters: array-valued constants of a built scene.

Everything the jitted step needs that is an array but constant during
simulation: per-particle material properties (reference particles_i,
mpm_simulator.py:95-103), precomputed static-collider grids, effector SDF
voxels, injector random-offset tables, smoke free-space mask.
"""

from __future__ import annotations

from typing import Any, Optional, Tuple

import jax.numpy as jnp
import numpy as np
from flax import struct

from fluidlab_tpu.config import materials as M
from fluidlab_tpu.engine.config import SimCfg
from fluidlab_tpu.engine.sdf import ColliderParams


@struct.dataclass
class SceneParams:
    # static per-particle properties (reference init_particles_kernel,
    # mpm_simulator.py:150-175)
    p_mu: Optional[jnp.ndarray] = None  # (N,)
    p_lam: Optional[jnp.ndarray] = None  # (N,)
    p_mass: Optional[jnp.ndarray] = None  # (N,)
    p_mat: Optional[jnp.ndarray] = None  # (N,) int32 material id
    p_mat_cls: Optional[jnp.ndarray] = None  # (N,) int32 material class
    p_body: Optional[jnp.ndarray] = None  # (N,) int32 body id
    body_n: Optional[jnp.ndarray] = None  # (B,) per-body particle counts
    # statics, precomputed at MPM grid cell centers (TPU-first: statics
    # never move, so SDF+normal per cell are build-time constants)
    statics_sdf: Optional[jnp.ndarray] = None  # (S, G^3)
    statics_normal: Optional[jnp.ndarray] = None  # (S, G^3, 3)
    statics_friction: Optional[jnp.ndarray] = None  # (S,)
    # per-effector data (tuples aligned with cfg.agent.effectors)
    colliders: Tuple[Optional[ColliderParams], ...] = ()
    inj_rand: Tuple[Optional[jnp.ndarray], ...] = ()  # (L, flux, 3)
    inj_act_range: Tuple[Optional[jnp.ndarray], ...] = ()  # (K,) int32
    # smoke free-space mask, build-time constant (statics never move;
    # reference recomputes it per step, smoke_field.py:190-201)
    smoke_free: Optional[jnp.ndarray] = None  # (R, R, R) bool
    # loss-specific constants (target trajectories etc.) live in the loss


def particle_params_from_properties(
    mat: np.ndarray, rho: np.ndarray, body_id: np.ndarray, cfg: SimCfg
) -> dict:
    """Vectorized per-particle property lookup (reference
    mpm_simulator.py:136-148)."""
    mat = np.asarray(mat, dtype=np.int32)
    mu = M.MU_TABLE[mat].astype(np.float32)
    lam = M.LAMDA_TABLE[mat].astype(np.float32)
    mat_cls = M.MAT_CLASS_TABLE[mat]
    mass = (cfg.p_vol * np.asarray(rho)).astype(np.float32)
    body_id = np.asarray(body_id, dtype=np.int32)
    n_bodies = int(body_id.max()) + 1 if len(body_id) else 0
    body_n = np.array(
        [np.sum(body_id == b) for b in range(n_bodies)], dtype=np.float32
    )
    return dict(
        p_mu=jnp.asarray(mu),
        p_lam=jnp.asarray(lam),
        p_mass=jnp.asarray(mass),
        p_mat=jnp.asarray(mat),
        p_mat_cls=jnp.asarray(mat_cls),
        p_body=jnp.asarray(body_id),
        body_n=jnp.asarray(body_n),
    )


def grid_cell_positions(cfg: SimCfg) -> np.ndarray:
    """World-space positions of MPM grid nodes, flattened (G^3, 3).

    Grid node I sits at I*dx (reference grid_op queries at I*dx,
    mpm_simulator.py:390-398)."""
    G = cfg.n_grid
    idx = np.stack(
        np.meshgrid(np.arange(G), np.arange(G), np.arange(G), indexing="ij"),
        axis=-1,
    ).reshape(-1, 3)
    return (idx * cfg.dx).astype(np.float32)
