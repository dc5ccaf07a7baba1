"""Quadratic B-spline particle-grid interpolation weights.

MLS-MPM transfer stencil (reference mpm_simulator.py:331-353): each
particle couples to the 3x3x3 grid-node neighborhood of its base cell with
separable quadratic B-spline weights.
"""

from __future__ import annotations

import itertools

import jax.numpy as jnp
import numpy as np

# all 27 stencil offsets, static
STENCIL = np.array(list(itertools.product(range(3), repeat=3)), dtype=np.int32)


def base_and_fx(x, inv_dx):
    """Base cell index and fractional position (reference :335-336).

    x: (..., 3) positions in [0, 1]^3.  Returns (base int32 (..., 3),
    fx (..., 3)) with fx = x/dx - base in [0.5, 1.5].
    """
    xs = x * inv_dx
    base = jnp.floor(xs - 0.5).astype(jnp.int32)
    fx = xs - base.astype(x.dtype)
    return base, fx


def quadratic_weights(fx):
    """Per-axis quadratic B-spline weights, shape (..., 3, 3).

    w[..., o, d] is the weight of stencil offset o along axis d
    (reference :337): [0.5*(1.5-fx)^2, 0.75-(fx-1)^2, 0.5*(fx-0.5)^2].
    """
    w0 = 0.5 * (1.5 - fx) ** 2
    w1 = 0.75 - (fx - 1.0) ** 2
    w2 = 0.5 * (fx - 0.5) ** 2
    return jnp.stack([w0, w1, w2], axis=-2)


def base_and_fx_soa(x, inv_dx):
    """SoA variant: x (3, N) -> (base (3, N) int32, fx (3, N))."""
    xs = x * inv_dx
    base = jnp.floor(xs - 0.5).astype(jnp.int32)
    fx = xs - base.astype(x.dtype)
    return base, fx


def quadratic_weights_soa(fx):
    """SoA variant: fx (3, N) -> w (3 offsets, 3 axes, N)."""
    w0 = 0.5 * (1.5 - fx) ** 2
    w1 = 0.75 - (fx - 1.0) ** 2
    w2 = 0.5 * (fx - 0.5) ** 2
    return jnp.stack([w0, w1, w2])  # (offset, axis, N)


def quadratic_dweights_soa(fx):
    """d w_o / d fx, SoA: fx (3, N) -> (3 offsets, 3 axes, N).

    Used by the transfer backward kernels (ops/transfer_bwd_pallas.py)
    to contract grid cotangents against derivative-weight stencils and
    return d_fx directly — 3 marginals instead of the 9 per-(axis,
    offset) weight cotangents."""
    d0 = fx - 1.5
    d1 = -2.0 * (fx - 1.0)
    d2 = fx - 0.5
    return jnp.stack([d0, d1, d2])  # (offset, axis, N)
