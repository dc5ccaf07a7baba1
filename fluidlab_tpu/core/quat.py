"""Quaternion / SE(3) utilities (wxyz convention), pure JAX.

Functional equivalents of the reference geometry helpers
(reference fluidlab/utils/geom.py:7-143).  All functions work on single
vectors or on leading-batch axes (they only touch the trailing axis), are
jit/vmap/grad-safe, and avoid data-dependent control flow.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

EPS = 1e-12


def qmul(q, r):
    """Hamilton product q*r, renormalized (reference geom.py:7-15)."""
    w1, x1, y1, z1 = q[..., 0], q[..., 1], q[..., 2], q[..., 3]
    w2, x2, y2, z2 = r[..., 0], r[..., 1], r[..., 2], r[..., 3]
    w = w1 * w2 - x1 * x2 - y1 * y2 - z1 * z2
    x = w1 * x2 + x1 * w2 + y1 * z2 - z1 * y2
    y = w1 * y2 - x1 * z2 + y1 * w2 + z1 * x2
    z = w1 * z2 + x1 * y2 - y1 * x2 + z1 * w2
    out = jnp.stack([w, x, y, z], axis=-1)
    # normalize to prevent drift/NaN, matching the reference's choice
    return out / jnp.sqrt(jnp.sum(out * out, axis=-1, keepdims=True))


def w2quat(axis_angle):
    """Axis-angle (scaled axis) -> quaternion (reference geom.py:17-28)."""
    w = jnp.sqrt(jnp.sum(axis_angle * axis_angle, axis=-1, keepdims=True) + EPS)
    v = (axis_angle / w) * jnp.sin(w / 2.0)
    return jnp.concatenate([jnp.cos(w / 2.0), v], axis=-1)


def inv_quat(q):
    """Conjugate/normalize (reference geom.py:30-32)."""
    conj = q * jnp.asarray([1.0, -1.0, -1.0, -1.0], dtype=q.dtype)
    return conj / jnp.sqrt(jnp.sum(conj * conj, axis=-1, keepdims=True))


def transform_by_quat(v, q):
    """Rotate vector(s) v by quaternion q (reference geom.py:96-101)."""
    qvec = q[..., 1:4]
    uv = jnp.cross(qvec, v)
    uuv = jnp.cross(qvec, uv)
    return v + 2.0 * (q[..., 0:1] * uv + uuv)


def inv_transform_by_quat(v, q):
    return transform_by_quat(v, inv_quat(q))


def transform_by_trans_quat(pos, trans, q):
    """world = R(q) @ pos + trans (reference geom.py:118-120)."""
    return transform_by_quat(pos, q) + trans


def inv_transform_by_trans_quat(pos, trans, q):
    """local = R(q)^-1 @ (pos - trans) (reference geom.py:122-124)."""
    return transform_by_quat(pos - trans, inv_quat(q))


def transform_by_T(pos, T):
    """Apply 4x4 homogeneous transform to 3-vector(s) (reference geom.py:107-111)."""
    return pos @ T[:3, :3].T + T[:3, 3]


def normalize(v, eps=EPS):
    return v / jnp.sqrt(jnp.sum(v * v, axis=-1, keepdims=True) + eps)


def quat_rot_matrix(q):
    """Rotation matrix with the SAME polynomial (and therefore the same
    off-unit-sphere extension and gradients) as ``transform_by_quat``:
    R = I + 2 w [u]x + 2 [u]x^2, u = q[1:4].  ``quat_to_R`` is the
    textbook unit-quaternion polynomial whose radial derivative differs;
    use THIS one when replacing per-vector quat transforms with a
    matrix so autodiff stays bit-equivalent (engine/sdf.py matrix-form
    collide)."""
    w, x, y, z = q[0], q[1], q[2], q[3]
    zero = jnp.zeros_like(w)
    K = jnp.stack([
        jnp.stack([zero, -z, y]),
        jnp.stack([z, zero, -x]),
        jnp.stack([-y, x, zero]),
    ])
    return jnp.eye(3, dtype=q.dtype) + 2.0 * w * K + 2.0 * (K @ K)


def quat_to_R(q):
    """Quaternion (wxyz) -> 3x3 rotation matrix."""
    w, x, y, z = q[..., 0], q[..., 1], q[..., 2], q[..., 3]
    R = jnp.stack(
        [
            1 - 2 * (y * y + z * z), 2 * (x * y - w * z), 2 * (x * z + w * y),
            2 * (x * y + w * z), 1 - 2 * (x * x + z * z), 2 * (y * z - w * x),
            2 * (x * z - w * y), 2 * (y * z + w * x), 1 - 2 * (x * x + y * y),
        ],
        axis=-1,
    )
    return R.reshape(q.shape[:-1] + (3, 3))


# ---------------------- host-side (numpy) helpers --------------------------

def euler_to_quat_np(euler_deg) -> np.ndarray:
    """Euler 'zyx' degrees (applied as reference: zyx order on reversed
    tuple) -> wxyz quaternion (reference effector.py:45, bodies.py:81)."""
    ez, ey, ex = np.deg2rad(np.asarray(euler_deg, dtype=np.float64))[::-1]
    cz, sz = np.cos(ez / 2), np.sin(ez / 2)
    cy, sy = np.cos(ey / 2), np.sin(ey / 2)
    cx, sx = np.cos(ex / 2), np.sin(ex / 2)
    # R = Rz(ez) @ Ry(ey) @ Rx(ex); quaternion composition in same order
    w = cz * cy * cx + sz * sy * sx
    x = cz * cy * sx - sz * sy * cx
    y = cz * sy * cx + sz * cy * sx
    z = sz * cy * cx - cz * sy * sx
    return np.array([w, x, y, z])


def euler_to_R_np(euler_deg) -> np.ndarray:
    """Rotation matrix for euler 'zyx' on reversed tuple, matching
    scipy Rotation.from_euler('zyx', euler[::-1], degrees=True)
    (reference bodies.py:81)."""
    ez, ey, ex = np.deg2rad(np.asarray(euler_deg, dtype=np.float64))[::-1]
    Rz = np.array([[np.cos(ez), -np.sin(ez), 0], [np.sin(ez), np.cos(ez), 0], [0, 0, 1]])
    Ry = np.array([[np.cos(ey), 0, np.sin(ey)], [0, 1, 0], [-np.sin(ey), 0, np.cos(ey)]])
    Rx = np.array([[1, 0, 0], [0, np.cos(ex), -np.sin(ex)], [0, np.sin(ex), np.cos(ex)]])
    return Rz @ Ry @ Rx


def quat_to_R_np(q) -> np.ndarray:
    """wxyz quaternion -> 3x3 rotation, host-side numpy (twin of
    quat_to_R; used by the renderers so a frame never dispatches a
    device op)."""
    w, x, y, z = np.asarray(q, dtype=np.float64)
    return np.array(
        [
            [1 - 2 * (y * y + z * z), 2 * (x * y - w * z), 2 * (x * z + w * y)],
            [2 * (x * y + w * z), 1 - 2 * (x * x + z * z), 2 * (y * z - w * x)],
            [2 * (x * z - w * y), 2 * (y * z + w * x), 1 - 2 * (x * x + y * y)],
        ]
    )


def trans_quat_to_T_np(trans=None, quat=None) -> np.ndarray:
    """4x4 homogeneous transform from translation + wxyz quaternion
    (reference geom.py:47-59)."""
    T = np.eye(4)
    if quat is not None:
        T[:3, :3] = quat_to_R_np(quat)
    if trans is not None:
        T[:3, 3] = np.asarray(trans)
    return T


def scale_to_T_np(scale) -> np.ndarray:
    T = np.eye(4)
    T[[0, 1, 2], [0, 1, 2]] = np.asarray(scale)
    return T


def compute_camera_angle_np(camera_pos, camera_lookat):
    """Camera yaw/pitch from pos/lookat (reference geom.py:132-143)."""
    d = np.asarray(camera_lookat, dtype=np.float64) - np.asarray(camera_pos, dtype=np.float64)
    angle_x = np.arctan2(-d[0], -d[2])
    angle_y = np.arctan2(d[1], np.linalg.norm([d[0], d[2]]))
    return np.array([angle_x, angle_y, 0.0])


def transform_by_quat_soa(v, q):
    """Rotate SoA vectors v (3, M) by a single quaternion q (4,)."""
    qv = (q[1], q[2], q[3])
    uv = (
        qv[1] * v[2] - qv[2] * v[1],
        qv[2] * v[0] - qv[0] * v[2],
        qv[0] * v[1] - qv[1] * v[0],
    )
    uuv = (
        qv[1] * uv[2] - qv[2] * uv[1],
        qv[2] * uv[0] - qv[0] * uv[2],
        qv[0] * uv[1] - qv[1] * uv[0],
    )
    return jnp.stack([v[i] + 2.0 * (q[0] * uv[i] + uuv[i]) for i in range(3)])


def inv_transform_by_trans_quat_soa(pos, trans, q):
    """local = R(q)^-1 (pos - trans) for SoA pos (3, M)."""
    qi = inv_quat(q)
    shifted = jnp.stack([pos[i] - trans[i] for i in range(3)])
    return transform_by_quat_soa(shifted, qi)


def transform_by_trans_quat_soa(pos, trans, q):
    """world = R(q) pos + trans for SoA pos (3, M)."""
    rotated = transform_by_quat_soa(pos, q)
    return jnp.stack([rotated[i] + trans[i] for i in range(3)])
