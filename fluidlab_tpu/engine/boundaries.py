"""Domain boundaries: cube and cylinder clamps with restitution.

Pure-function equivalents of the reference boundaries (reference
fluidlab/fluidengine/boundaries/boundaries.py:8-142).  Boundary parameters
are static dataclass fields baked into the jitted step.

Layout: positions/velocities are component-major — shape (3,) for a
single point or (3, M) for a batch (the TPU-friendly SoA layout, see
core/mat3.py).  All methods index components on the leading axis, so the
same code serves effector poses and particle/grid batches.
"""

from __future__ import annotations

import dataclasses
from typing import Tuple

import jax.numpy as jnp

EPS = 1e-12


def _stack3(a, b, c):
    return jnp.stack([a, b, c])


@dataclasses.dataclass(frozen=True)
class CubeBoundary:
    """Axis-aligned box clamp (reference boundaries.py:96-134)."""

    lower: Tuple[float, float, float] = (0.05, 0.05, 0.05)
    upper: Tuple[float, float, float] = (0.95, 0.95, 0.95)
    restitution: float = 0.0
    lock_dims: Tuple[int, ...] = ()

    def impose_x_v(self, x, v):
        xs, vs = [], []
        for i in range(3):
            lo, hi = self.lower[i], self.upper[i]
            vi = v[i]
            out = ((x[i] >= hi) & (vi >= 0)) | ((x[i] <= lo) & (vi <= 0))
            vi = jnp.where(out, vi * (-self.restitution), vi)
            if i in self.lock_dims:
                vi = jnp.zeros_like(vi)
            xs.append(jnp.clip(x[i], lo, hi))
            vs.append(vi)
        return _stack3(*xs), _stack3(*vs)

    def impose_x(self, x):
        return _stack3(*[
            jnp.clip(x[i], self.lower[i], self.upper[i]) for i in range(3)
        ])

    def is_out(self, x):
        out = jnp.zeros(x.shape[1:], bool) if x.ndim > 1 else jnp.asarray(False)
        for i in range(3):
            out = out | (x[i] > self.upper[i]) | (x[i] < self.lower[i])
        return out


@dataclasses.dataclass(frozen=True)
class CylinderBoundary:
    """Vertical cylinder clamp (reference boundaries.py:28-93)."""

    y_range: Tuple[float, float] = (0.05, 0.95)
    xz_center: Tuple[float, float] = (0.5, 0.5)
    xz_radius: float = 0.45
    restitution: float = 0.0
    lock_dims: Tuple[int, ...] = ()

    def _radial(self, x):
        cx, cz = self.xz_center
        rx = x[0] - cx
        rz = x[2] - cz
        r = jnp.sqrt(rx * rx + rz * rz + EPS)
        return rx, rz, r

    def impose_x_v(self, x, v):
        y_lo, y_hi = self.y_range
        vy = v[1]
        vy = jnp.where((x[1] > y_hi) & (vy > 0), vy * (-self.restitution), vy)
        vy = jnp.where((x[1] < y_lo) & (vy < 0), vy * (-self.restitution), vy)
        y_new = jnp.clip(x[1], y_lo, y_hi)

        cx, cz = self.xz_center
        rx, rz, r = self._radial(x)
        outside = r > self.xz_radius
        scale = self.xz_radius / r
        x_new = jnp.where(outside, cx + rx * scale, jnp.clip(x[0], 0.0, 1.0))
        z_new = jnp.where(outside, cz + rz * scale, jnp.clip(x[2], 0.0, 1.0))
        vx = jnp.where(outside, 0.0, v[0])
        vz = jnp.where(outside, 0.0, v[2])
        vs = [vx, vy, vz]
        for i in self.lock_dims:
            vs[i] = jnp.zeros_like(vs[i])
        return _stack3(x_new, y_new, z_new), _stack3(*vs)

    def impose_x(self, x):
        y_lo, y_hi = self.y_range
        y_new = jnp.clip(x[1], y_lo, y_hi)
        cx, cz = self.xz_center
        rx, rz, r = self._radial(x)
        outside = r > self.xz_radius
        scale = self.xz_radius / r
        x_new = jnp.where(outside, cx + rx * scale, jnp.clip(x[0], 0.0, 1.0))
        z_new = jnp.where(outside, cz + rz * scale, jnp.clip(x[2], 0.0, 1.0))
        return _stack3(x_new, y_new, z_new)

    def is_out(self, x):
        y_lo, y_hi = self.y_range
        _, _, r = self._radial(x)
        return (x[1] > y_hi) | (x[1] < y_lo) | (r > self.xz_radius)


def create_boundary(type="cube", **kwargs):
    """Factory matching the reference (boundaries.py:136-142)."""
    from fluidlab_tpu.utils.misc import eval_str

    kwargs = {k: eval_str(v) if isinstance(v, str) else v for k, v in kwargs.items()}
    for key in ("lower", "upper", "y_range", "xz_center", "lock_dims"):
        if key in kwargs and kwargs[key] is not None:
            kwargs[key] = tuple(kwargs[key])
    if type == "cylinder":
        return CylinderBoundary(**kwargs)
    if type == "cube":
        return CubeBoundary(**kwargs)
    raise ValueError(f"unknown boundary type {type!r}")
