"""Particle-to-grid transfer implementations (the TPU-hard kernel).

The MLS-MPM P2G scatter (reference mpm_simulator.py:331-353) is the
throughput-determining kernel (SURVEY.md §7 hard-parts #1).  TPUs have no
fast global atomics and XLA lowers duplicate-index scatter to a slow
serialized form, so we provide multiple implementations behind one
interface, selected by ``SimCfg.p2g_impl``:

- ``scatter`` : single batched ``.at[].add`` over the 27N stencil points.
- ``sort``    : sort (cell, value) pairs by cell id + ordered segment sum.
- ``dense``   : matmul formulation — per particle the scattered value is
                affine in the target cell position,
                    val(c) = w_pc * (m v_p + A_p (x_c - x_p))
                           = w_pc * b_p + w_pc * A_p x_c,
                so the whole transfer is out = W @ [b | A | m] followed by
                a cheap cell-position contraction, where W is the sparse
                stencil weight matrix realized densely per axis in
                particle chunks (MXU work, zero scatters).

All variants return a flattened (G^3, 4) grid [momentum, mass] and are
differentiable (AD generates the gather transposes).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from fluidlab_tpu.core.bspline import STENCIL
from fluidlab_tpu.core.mat3 import matvec3

_OFFSETS = [tuple(int(v) for v in o) for o in STENCIL]


def _stencil_values(base, fx, w, usedf, mass, v, affine, G, dx):
    """Yield (idx, value4) per stencil offset (reference :346-353)."""
    mom = mass[:, None] * v
    for (oi, oj, ok) in _OFFSETS:
        wi = w[:, oi, 0] * w[:, oj, 1] * w[:, ok, 2] * usedf
        off = jnp.asarray([oi, oj, ok], dtype=fx.dtype)
        dpos = (off - fx) * dx
        val3 = wi[:, None] * (mom + matvec3(affine, dpos))
        valm = wi * mass
        idx = (
            (base[:, 0] + oi) * (G * G)
            + (base[:, 1] + oj) * G
            + (base[:, 2] + ok)
        )
        yield idx, jnp.concatenate([val3, valm[:, None]], axis=-1)


def p2g_scatter(base, fx, w, usedf, mass, v, affine, G, dx):
    idxs, vals = [], []
    for idx, val in _stencil_values(base, fx, w, usedf, mass, v, affine, G, dx):
        idxs.append(idx)
        vals.append(val)
    return (
        jnp.zeros((G * G * G, 4), v.dtype)
        .at[jnp.concatenate(idxs)]
        .add(jnp.concatenate(vals))
    )


def p2g_sort(base, fx, w, usedf, mass, v, affine, G, dx):
    idxs, vals = [], []
    for idx, val in _stencil_values(base, fx, w, usedf, mass, v, affine, G, dx):
        idxs.append(idx)
        vals.append(val)
    idx = jnp.concatenate(idxs)
    val = jnp.concatenate(vals)
    order = jnp.argsort(idx)
    return jax.ops.segment_sum(
        val[order], idx[order], num_segments=G * G * G,
        indices_are_sorted=True,
    )


def _axis_onehot(base_a, w_a, G, usedf=None):
    """(G, N) dense per-axis stencil weights: W[g, p] = w_a[p, g-base_a[p]]
    for g-base in {0,1,2}."""
    g_ids = jax.lax.broadcasted_iota(jnp.int32, (G, base_a.shape[0]), 0)
    off = g_ids - base_a[None, :]
    in_range = (off >= 0) & (off <= 2)
    vals = jnp.take_along_axis(w_a.T, jnp.clip(off, 0, 2), axis=0)
    out = jnp.where(in_range, vals, 0.0)
    if usedf is not None:
        out = out * usedf[None, :]
    return out


def _dense_chunk(base, w, usedf, feats, G):
    """(G^3, C) accumulation of one particle chunk via axis-factored
    matmuls."""
    C = feats.shape[-1]
    Wx = _axis_onehot(base[:, 0], w[:, :, 0], G, usedf)  # (G, N)
    Wy = _axis_onehot(base[:, 1], w[:, :, 1], G)
    Wz = _axis_onehot(base[:, 2], w[:, :, 2], G)
    # T1[(i j), p] = Wx[i, p] Wy[j, p]
    T1 = (Wx[:, None, :] * Wy[None, :, :]).reshape(G * G, -1)
    # WzF[p, (k c)] = Wz[k, p] feats[p, c]
    WzF = (Wz[:, :, None] * feats[None, :, :]).transpose(1, 0, 2).reshape(
        -1, G * C
    )
    out = T1 @ WzF  # (G^2, G*C)  — MXU
    return out.reshape(G, G, G, C).reshape(G * G * G, C)


def p2g_dense(base, fx, w, usedf, mass, v, affine, G, dx, chunk=4096):
    """Matmul P2G: scatter value is affine in the cell position, so
    accumulate the 13 per-particle coefficients [b, A, m] with dense
    stencil matmuls and contract with cell coordinates once."""
    N = base.shape[0]
    x_p = (base.astype(v.dtype) + fx) * dx
    b = mass[:, None] * v - matvec3(affine, x_p)  # (N, 3)
    feats = jnp.concatenate(
        [b, affine.reshape(N, 9), mass[:, None]], axis=-1
    )  # (N, 13)

    pad = (-N) % chunk
    if pad:
        zf = lambda a: jnp.concatenate(
            [a, jnp.zeros((pad,) + a.shape[1:], a.dtype)]
        )
        base, w, usedf, feats = zf(base), zf(w), zf(usedf), zf(feats)
    n_chunks = (N + pad) // chunk

    def body(acc, inp):
        b_, w_, u_, f_ = inp
        return acc + _dense_chunk(b_, w_, u_, f_, G), None

    xs = (
        base.reshape(n_chunks, chunk, 3),
        w.reshape(n_chunks, chunk, 3, 3),
        usedf.reshape(n_chunks, chunk),
        feats.reshape(n_chunks, chunk, 13),
    )
    acc, _ = jax.lax.scan(
        jax.checkpoint(body),
        jnp.zeros((G * G * G, 13), v.dtype),
        xs,
    )

    # combine: mom = b_sum + A_sum @ x_cell ; mass = m_sum
    ii = jax.lax.broadcasted_iota(jnp.int32, (G, G, G), 0)
    jj = jax.lax.broadcasted_iota(jnp.int32, (G, G, G), 1)
    kk = jax.lax.broadcasted_iota(jnp.int32, (G, G, G), 2)
    x_cell = (
        jnp.stack([ii, jj, kk], -1).reshape(G * G * G, 3).astype(v.dtype) * dx
    )
    b_sum = acc[:, :3]
    A_sum = acc[:, 3:12].reshape(-1, 3, 3)
    m_sum = acc[:, 12:]
    mom = b_sum + matvec3(A_sum, x_cell)
    return jnp.concatenate([mom, m_sum], axis=-1)


P2G_IMPLS = {
    "scatter": p2g_scatter,
    "sort": p2g_sort,
    "dense": p2g_dense,
}


def get_p2g(name: str):
    if name == "pallas":
        import jax as _jax

        from fluidlab_tpu.ops.p2g_pallas import p2g_pallas

        def _pallas_auto(*args, **kw):
            # Mosaic kernels need a TPU; fall back to interpret elsewhere
            interpret = _jax.default_backend() != "tpu" and not str(
                _jax.devices()[0]
            ).startswith("TPU")
            return p2g_pallas(*args, interpret=interpret, **kw)

        return _pallas_auto
    return P2G_IMPLS[name]
