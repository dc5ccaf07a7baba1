"""Voxel-SDF collision: trilinear lookup, static & dynamic colliders.

Functional equivalents of the reference mesh colliders (reference
fluidlab/fluidengine/meshes/static.py:25-114 and dynamic.py:29-161).

TPU-first deviations from the reference:

- Statics never move, so their SDF value and contact normal at every MPM
  grid-cell center are **precomputed once at build time** (the reference
  re-evaluates trilerp + 6-point finite differences per cell per substep,
  static.py:65-79).  Runtime static collision is then a pure masked
  velocity projection — zero gathers.
- Dynamic colliders trilerp a precomputed voxel *gradient* field for
  normals (one 8-corner gather pass) instead of finite differencing the
  trilerp (13 SDF evaluations, dynamic.py:69-84).
- Layout is SoA/component-major: query batches are (3, M), normals
  (3, M), gradient voxels (3, V, V, V) — the particle/cell axis is minor
  so TPU lane tiling packs fully (see core/mat3.py).
"""

from __future__ import annotations

import functools
import os
from typing import Tuple

import jax.numpy as jnp
import numpy as np
from flax import struct

from fluidlab_tpu.core import quat as quat_ops

EPS = 1e-12


@struct.dataclass
class ColliderParams:
    """Device-side voxel data for one dynamic (effector-attached) collider."""

    sdf: jnp.ndarray  # (V, V, V)
    grad: jnp.ndarray  # (3, V, V, V) voxel-space gradient of sdf
    T_mesh_to_voxels: jnp.ndarray  # (4, 4)
    # host-precomputed inv(T_mesh_to_voxels[:3,:3]) — a per-collider
    # CONSTANT.  With FL_COLLIDE_INV=host, dynamic_collide uses this and
    # the on-device jnp.linalg.inv (a TPU linalg custom-call inside the
    # differentiated grid_op — a pouring-fault candidate, RESULTS r5) is
    # eliminated.  None keeps the legacy on-device inverse so existing
    # compiled programs stay valid mid-round.
    R_vox_to_mesh: jnp.ndarray = None


def sdf_trilerp_soa(values, pos_vox, outside_value: float = 1.0):
    """Trilinear interpolation at (3, M) voxel coords.

    ``values``: (V, V, V) scalar or (C, V, V, V) channel-major field.
    Out-of-grid queries return ``outside_value`` (reference
    static.py:33-48)."""
    scalar = values.ndim == 3
    vals = values[None] if scalar else values
    C = vals.shape[0]
    res = vals.shape[1]
    flat = vals.reshape(C, -1)

    base = [jnp.floor(pos_vox[i]).astype(jnp.int32) for i in range(3)]
    oog = jnp.zeros(pos_vox.shape[1:], bool)
    for i in range(3):
        oog = oog | (base[i] >= res - 1) | (base[i] < 0)
    base_c = [jnp.clip(b, 0, res - 2) for b in base]

    acc = [jnp.zeros(pos_vox.shape[1:], vals.dtype) for _ in range(C)]
    for dx in (0, 1):
        for dy in (0, 1):
            for dz in (0, 1):
                cx = base_c[0] + dx
                cy = base_c[1] + dy
                cz = base_c[2] + dz
                w = (
                    (1.0 - jnp.abs(pos_vox[0] - cx))
                    * (1.0 - jnp.abs(pos_vox[1] - cy))
                    * (1.0 - jnp.abs(pos_vox[2] - cz))
                )
                idx = (cx * res + cy) * res + cz
                for c in range(C):
                    acc[c] = acc[c] + w * flat[c][idx]
    out = [jnp.where(oog, outside_value, a) for a in acc]
    return out[0] if scalar else jnp.stack(out)


def voxel_gradient(sdf_voxels: np.ndarray, delta: float = 1.0) -> np.ndarray:
    """Central-difference gradient (3, V, V, V), host-side."""
    g = np.stack(
        [np.gradient(sdf_voxels, delta, axis=ax) for ax in range(3)]
    )
    return g.astype(sdf_voxels.dtype)


def _friction_project_soa(rel_v, normal, friction):
    """Coulomb-style velocity projection (reference static.py:88-102).
    rel_v, normal: (3, M)."""
    nc = sum(rel_v[i] * normal[i] for i in range(3))
    nc_neg = jnp.minimum(nc, 0.0)
    rel_t = [rel_v[i] - nc_neg * normal[i] for i in range(3)]
    # guarded sqrt: at rest rel_t == 0 exactly, and d sqrt(x)/dx -> inf
    # at 0 turns into inf * 0 = NaN through the flag-gated `where`
    # below (both branches' cotangents are computed) — poisoning the
    # whole action gradient.  The epsilon shifts tnorm by <= 1e-12,
    # far below the EPS contact gate.
    tnorm = jnp.sqrt(sum(t * t for t in rel_t) + 1e-24)
    safe = jnp.maximum(tnorm, EPS)
    scale = jnp.maximum(0.0, tnorm + nc * friction) / safe
    flag = (nc < 0) & (tnorm > EPS)
    return jnp.stack([
        jnp.where(flag, rel_t[i] * scale, rel_t[i]) for i in range(3)
    ])


def static_collide(v, sdf_cell, normal_cell, friction):
    """Grid-node collision with precomputed static SDF (reference
    static.py:82-104).  v (3, M), sdf_cell (M,), normal_cell (3, M)."""
    projected = _friction_project_soa(v, normal_cell, friction)
    hit = sdf_cell <= 0.0
    return jnp.stack([
        jnp.where(hit, projected[i], v[i]) for i in range(3)
    ])


def _world_to_voxels(pos_mesh, T):
    """(3, M) mesh coords -> voxel coords via 4x4 T."""
    return jnp.stack([
        T[i, 0] * pos_mesh[0] + T[i, 1] * pos_mesh[1]
        + T[i, 2] * pos_mesh[2] + T[i, 3]
        for i in range(3)
    ])


def dynamic_collide(
    collider: ColliderParams,
    friction: float,
    softness: float,
    pos_world,  # (3, M)
    mat_v,  # (3, M)
    eff_pos,
    eff_quat,
    eff_pos_next,
    eff_quat_next,
    dt: float,
):
    """Soft-coupled moving-SDF collision (reference dynamic.py:93-121).

    FL_COLLIDE_REMAT=1 wraps the whole computation in ``jax.checkpoint``
    — identical math, but the adjoint recomputes the forward inside a
    remat boundary, which changes XLA's fusion/scheduling.  Candidate
    route-around for the pouring grid-collide worker fault (RESULTS r5
    dossier: the fault follows the grid-site collide ADJOINT program,
    not any specific sub-op isolated so far)."""
    impl = (_dynamic_collide_matrix
            if os.environ.get("FL_COLLIDE_IMPL") == "matrix"
            else _dynamic_collide_impl)
    if os.environ.get("FL_COLLIDE_REMAT") == "1":
        import jax

        inner = functools.partial(impl, collider, friction, softness)
        return jax.checkpoint(inner)(
            pos_world, mat_v, eff_pos, eff_quat, eff_pos_next,
            eff_quat_next, dt,
        )
    return impl(
        collider, friction, softness, pos_world, mat_v, eff_pos,
        eff_quat, eff_pos_next, eff_quat_next, dt,
    )


def dynamic_collide_aux(
    collider: ColliderParams,
    friction: float,
    softness: float,
    pos_world,  # (3, M)
    eff_pos,
    eff_quat,
    eff_pos_next,
    eff_quat_next,
    dt: float,
):
    """Pose-dependent auxiliaries of dynamic_collide (matrix form):
    (active, influence, normal, collider_v).  No mat_v dependence —
    everything here is a function of effector poses and the (usually
    constant) query positions.  Split out so the grid-site collide can
    precompute these OUTSIDE the differentiated grid phase (RESULTS r5
    pouring dossier: the trilerp/where machinery inside the recomputed
    gridop backward faults the TPU worker even with stop_gradient'd
    poses; hoisting it leaves only dynamic_collide_blend in the
    backward program)."""
    R0inv = quat_ops.quat_rot_matrix(quat_ops.inv_quat(eff_quat))
    R1 = quat_ops.quat_rot_matrix(eff_quat_next)
    pos_mesh = R0inv @ (pos_world - eff_pos[:, None])
    pos_vox = _world_to_voxels(pos_mesh, collider.T_mesh_to_voxels)

    signed_dist = sdf_trilerp_soa(collider.sdf, pos_vox, outside_value=1.0)
    influence = jnp.minimum(jnp.exp(-signed_dist * softness), 1.0)
    active = (signed_dist <= 0.0) | ((softness > 0.0) & (influence > 0.1))

    pos_world_new = R1 @ pos_mesh + eff_pos_next[:, None]
    collider_v = (pos_world_new - pos_world) / dt

    if friction > 10.0:
        normal = jnp.zeros_like(collider_v)
    else:
        g_vox = sdf_trilerp_soa(collider.grad, pos_vox, outside_value=0.0)
        if (os.environ.get("FL_COLLIDE_INV") == "host"
                and collider.R_vox_to_mesh is not None):
            Rvm = collider.R_vox_to_mesh
        else:
            Rvm = jnp.linalg.inv(collider.T_mesh_to_voxels[:3, :3])
        R0 = quat_ops.quat_rot_matrix(eff_quat)
        g_world = (R0 @ Rvm) @ g_vox
        norm = jnp.sqrt(sum(g_world[i] ** 2 for i in range(3)) + EPS)
        normal = g_world / norm
    return active, influence, normal, collider_v


def dynamic_collide_blend(friction, active, influence, normal,
                          collider_v, mat_v):
    """Velocity-blend stage of dynamic_collide given precomputed
    auxiliaries — the ONLY part that depends on mat_v.  Same math as
    the corresponding tail of _dynamic_collide_impl."""
    if friction > 10.0:
        v_new = collider_v
    else:
        rel_v = mat_v - collider_v
        rel_t = _friction_project_soa(rel_v, normal, friction)
        v_new = collider_v + rel_t * influence + rel_v * (1.0 - influence)
    return jnp.stack([
        jnp.where(active, v_new[i], mat_v[i]) for i in range(3)
    ])


def _dynamic_collide_matrix(
    collider: ColliderParams,
    friction: float,
    softness: float,
    pos_world,  # (3, M)
    mat_v,  # (3, M)
    eff_pos,
    eff_quat,
    eff_pos_next,
    eff_quat_next,
    dt: float,
):
    """Matrix-form dynamic collide (FL_COLLIDE_IMPL=matrix).

    Identical math to ``_dynamic_collide_impl`` with the quaternions
    converted to rotation matrices ONCE (quat_to_R is differentiable,
    O(1)); every per-cell operation is then plain 3x3 matrix algebra
    whose adjoint reduces through (3, M) matmuls instead of per-cell
    quaternion chains.  Written for the pouring-fault dossier (RESULTS
    r5): the grid-site collide adjoint faults the TPU worker down to
    the sticky branch, whose differentiable surface is exactly the
    per-cell quat chain + select + pose-cotangent reduction that this
    form restructures.  Also strictly less per-cell work.
    """
    # quat_rot_matrix + inv_quat reproduce transform_by_quat_soa /
    # inv_transform_by_trans_quat_soa EXACTLY (same polynomial, same
    # gradients) — see core/quat.py
    R0inv = quat_ops.quat_rot_matrix(quat_ops.inv_quat(eff_quat))
    R1 = quat_ops.quat_rot_matrix(eff_quat_next)
    pos_mesh = R0inv @ (pos_world - eff_pos[:, None])  # (3, M)
    pos_vox = _world_to_voxels(pos_mesh, collider.T_mesh_to_voxels)

    signed_dist = sdf_trilerp_soa(collider.sdf, pos_vox, outside_value=1.0)
    influence = jnp.minimum(jnp.exp(-signed_dist * softness), 1.0)
    active = (signed_dist <= 0.0) | ((softness > 0.0) & (influence > 0.1))

    pos_world_new = R1 @ pos_mesh + eff_pos_next[:, None]
    collider_v = (pos_world_new - pos_world) / dt

    if friction > 10.0:  # sticky contact (reference dynamic.py:101-102)
        v_new = collider_v
    else:
        g_vox = sdf_trilerp_soa(collider.grad, pos_vox, outside_value=0.0)
        if (os.environ.get("FL_COLLIDE_INV") == "host"
                and collider.R_vox_to_mesh is not None):
            Rvm = collider.R_vox_to_mesh
        else:
            Rvm = jnp.linalg.inv(collider.T_mesh_to_voxels[:3, :3])
        R0 = quat_ops.quat_rot_matrix(eff_quat)
        g_world = (R0 @ Rvm) @ g_vox  # (3, M)
        norm = jnp.sqrt(sum(g_world[i] ** 2 for i in range(3)) + EPS)
        normal = g_world / norm
        rel_v = mat_v - collider_v
        rel_t = _friction_project_soa(rel_v, normal, friction)
        v_new = collider_v + rel_t * influence + rel_v * (1.0 - influence)

    return jnp.stack([
        jnp.where(active, v_new[i], mat_v[i]) for i in range(3)
    ])


def _dynamic_collide_impl(
    collider: ColliderParams,
    friction: float,
    softness: float,
    pos_world,  # (3, M)
    mat_v,  # (3, M)
    eff_pos,
    eff_quat,
    eff_pos_next,
    eff_quat_next,
    dt: float,
):
    pos_mesh = quat_ops.inv_transform_by_trans_quat_soa(
        pos_world, eff_pos, eff_quat
    )
    pos_vox = _world_to_voxels(pos_mesh, collider.T_mesh_to_voxels)

    signed_dist = sdf_trilerp_soa(collider.sdf, pos_vox, outside_value=1.0)
    influence = jnp.minimum(jnp.exp(-signed_dist * softness), 1.0)
    active = (signed_dist <= 0.0) | ((softness > 0.0) & (influence > 0.1))

    pos_world_new = quat_ops.transform_by_trans_quat_soa(
        pos_mesh, eff_pos_next, eff_quat_next
    )
    collider_v = (pos_world_new - pos_world) / dt

    if friction > 10.0:  # sticky contact (reference dynamic.py:101-102)
        v_new = collider_v
    else:
        g_vox = sdf_trilerp_soa(collider.grad, pos_vox, outside_value=0.0)
        if (os.environ.get("FL_COLLIDE_INV") == "host"
                and collider.R_vox_to_mesh is not None):
            Rvm = collider.R_vox_to_mesh
        else:
            Rvm = jnp.linalg.inv(collider.T_mesh_to_voxels[:3, :3])
        g_mesh = jnp.stack([
            Rvm[i, 0] * g_vox[0] + Rvm[i, 1] * g_vox[1] + Rvm[i, 2] * g_vox[2]
            for i in range(3)
        ])
        g_world = quat_ops.transform_by_quat_soa(g_mesh, eff_quat)
        norm = jnp.sqrt(sum(g_world[i] ** 2 for i in range(3)) + EPS)
        normal = g_world / norm
        rel_v = mat_v - collider_v
        rel_t = _friction_project_soa(rel_v, normal, friction)
        v_new = collider_v + rel_t * influence + rel_v * (1.0 - influence)

    return jnp.stack([
        jnp.where(active, v_new[i], mat_v[i]) for i in range(3)
    ])


def precompute_static_grid(
    sdf_voxels: np.ndarray,
    T_mesh_to_voxels: np.ndarray,
    cell_pos: np.ndarray,  # (M, 3) world-space query points (host, AoS)
) -> Tuple[np.ndarray, np.ndarray]:
    """Host-side static SDF + world normal at fixed query points; returns
    (sdf (M,), normal (3, M)).  Statics use world frame == mesh frame
    (reference static.py:26-31)."""
    res = sdf_voxels.shape[0]
    pos_vox = cell_pos @ T_mesh_to_voxels[:3, :3].T + T_mesh_to_voxels[:3, 3]

    def trilerp_np(vals, p, outside):
        base = np.floor(p).astype(np.int64)
        oog = np.any((base >= res - 1) | (base < 0), axis=-1)
        base_c = np.clip(base, 0, res - 2)
        acc = np.zeros(p.shape[:-1], dtype=np.float64)
        for dx in (0, 1):
            for dy in (0, 1):
                for dz in (0, 1):
                    corner = base_c + np.array([dx, dy, dz])
                    w_xyz = 1.0 - np.abs(p - corner)
                    w = w_xyz[..., 0] * w_xyz[..., 1] * w_xyz[..., 2]
                    acc = acc + w * vals[
                        corner[..., 0], corner[..., 1], corner[..., 2]
                    ]
        acc[oog] = outside
        return acc

    sdf = trilerp_np(sdf_voxels, pos_vox, 1.0)
    delta = 1e-2
    normal_vox = np.zeros_like(pos_vox)
    for i in range(3):
        inc = pos_vox.copy()
        dec = pos_vox.copy()
        inc[:, i] += delta
        dec[:, i] -= delta
        normal_vox[:, i] = (
            trilerp_np(sdf_voxels, inc, 1.0) - trilerp_np(sdf_voxels, dec, 1.0)
        ) / (2 * delta)
    R_vox_to_mesh = np.linalg.inv(T_mesh_to_voxels[:3, :3])
    normal_world = normal_vox @ R_vox_to_mesh.T
    norm = np.linalg.norm(normal_world, axis=-1, keepdims=True)
    normal_world = normal_world / np.maximum(norm, 1e-12)
    return sdf.astype(np.float32), normal_world.T.astype(np.float32)
