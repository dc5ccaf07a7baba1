"""Domain boundaries: cube and cylinder clamps with restitution.

Pure-function equivalents of the reference boundaries (reference
fluidlab/fluidengine/boundaries/boundaries.py:8-142).  Boundary parameters
are static dataclass fields baked into the jitted step, so the branch
structure compiles away; all runtime math is branch-free ``where`` lattices
over (..., 3) arrays.
"""

from __future__ import annotations

import dataclasses
from typing import Tuple

import jax.numpy as jnp

EPS = 1e-12


@dataclasses.dataclass(frozen=True)
class CubeBoundary:
    """Axis-aligned box clamp (reference boundaries.py:96-134)."""

    lower: Tuple[float, float, float] = (0.05, 0.05, 0.05)
    upper: Tuple[float, float, float] = (0.95, 0.95, 0.95)
    restitution: float = 0.0
    lock_dims: Tuple[int, ...] = ()

    def impose_x_v(self, x, v):
        lower = jnp.asarray(self.lower, dtype=x.dtype)
        upper = jnp.asarray(self.upper, dtype=x.dtype)
        # reflect velocity component pushing out of the box
        out_hi = (x >= upper) & (v >= 0)
        out_lo = (x <= lower) & (v <= 0)
        v = jnp.where(out_hi | out_lo, v * (-self.restitution), v)
        x_new = jnp.clip(x, lower, upper)
        if self.lock_dims:
            mask = jnp.zeros((3,), dtype=bool).at[list(self.lock_dims)].set(True)
            v = jnp.where(mask, 0.0, v)
        return x_new, v

    def impose_x(self, x):
        return jnp.clip(
            x,
            jnp.asarray(self.lower, dtype=x.dtype),
            jnp.asarray(self.upper, dtype=x.dtype),
        )

    def is_out(self, x):
        lower = jnp.asarray(self.lower, dtype=x.dtype)
        upper = jnp.asarray(self.upper, dtype=x.dtype)
        return jnp.any((x > upper) | (x < lower), axis=-1)


@dataclasses.dataclass(frozen=True)
class CylinderBoundary:
    """Vertical cylinder clamp (reference boundaries.py:28-93)."""

    y_range: Tuple[float, float] = (0.05, 0.95)
    xz_center: Tuple[float, float] = (0.5, 0.5)
    xz_radius: float = 0.45
    restitution: float = 0.0
    lock_dims: Tuple[int, ...] = ()

    def _clamped(self, x):
        lower = jnp.asarray([0.0, self.y_range[0], 0.0], dtype=x.dtype)
        upper = jnp.asarray([1.0, self.y_range[1], 1.0], dtype=x.dtype)
        x_new = jnp.clip(x, lower, upper)
        center = jnp.asarray(self.xz_center, dtype=x.dtype)
        r_vec = jnp.stack([x[..., 0], x[..., 2]], axis=-1) - center
        r_norm = jnp.sqrt(jnp.sum(r_vec * r_vec, axis=-1) + EPS)
        outside_r = r_norm > self.xz_radius
        new_xz = r_vec / r_norm[..., None] * self.xz_radius + center
        x_clamped = jnp.stack(
            [
                jnp.where(outside_r, new_xz[..., 0], x_new[..., 0]),
                x_new[..., 1],
                jnp.where(outside_r, new_xz[..., 1], x_new[..., 2]),
            ],
            axis=-1,
        )
        return x_clamped, outside_r, r_norm

    def impose_x_v(self, x, v):
        y_lo, y_hi = self.y_range
        vy = v[..., 1]
        vy = jnp.where(
            (x[..., 1] > y_hi) & (vy > 0), vy * (-self.restitution), vy
        )
        vy = jnp.where(
            (x[..., 1] < y_lo) & (vy < 0), vy * (-self.restitution), vy
        )
        x_new, outside_r, _ = self._clamped(x)
        # radial overflow kills horizontal velocity (reference :50-57)
        vx = jnp.where(outside_r, 0.0, v[..., 0])
        vz = jnp.where(outside_r, 0.0, v[..., 2])
        v_new = jnp.stack([vx, vy, vz], axis=-1)
        if self.lock_dims:
            mask = jnp.zeros((3,), dtype=bool).at[list(self.lock_dims)].set(True)
            v_new = jnp.where(mask, 0.0, v_new)
        return x_new, v_new

    def impose_x(self, x):
        x_new, _, _ = self._clamped(x)
        return x_new

    def is_out(self, x):
        y_lo, y_hi = self.y_range
        out_y = (x[..., 1] > y_hi) | (x[..., 1] < y_lo)
        center = jnp.asarray(self.xz_center, dtype=x.dtype)
        r_vec = jnp.stack([x[..., 0], x[..., 2]], axis=-1) - center
        r_norm = jnp.sqrt(jnp.sum(r_vec * r_vec, axis=-1) + EPS)
        return out_y | (r_norm > self.xz_radius)


def create_boundary(type="cube", **kwargs):
    """Factory matching the reference (boundaries.py:136-142).  Accepts the
    reference's yaml conventions (tuples possibly given as strings)."""
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
