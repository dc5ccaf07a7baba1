"""Particle-to-grid transfer implementations (the TPU-hard kernel).

The MLS-MPM P2G scatter (reference mpm_simulator.py:331-353) is the
throughput-determining kernel (SURVEY.md §7 hard-parts #1).  TPUs have no
fast global atomics and XLA lowers duplicate-index scatter to a slow
serialized sort, so we provide multiple implementations behind one
interface, selected by ``SimCfg.p2g_impl``:

- ``scatter`` : batched ``.at[].add`` over the 27N stencil points
                (reference semantics, CPU-friendly; slow on TPU).
- ``sort``    : sort (cell, value) pairs by cell id + ordered segment sum.
- ``pallas``  : block-binned MXU kernel (ops/p2g_pallas.py) — the TPU
                fast path.

Layout is SoA: base/fx (3, N), w (3 offsets, 3 axes, N), v (3, N),
affine (9, N); output grid is channel-major (4, G^3) [momentum, mass]
(see core/mat3.py for why the particle axis must be minor on TPU).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from fluidlab_tpu.core.bspline import STENCIL
from fluidlab_tpu.core.mat3 import mv_soa

_OFFSETS = [tuple(int(v) for v in o) for o in STENCIL]


def _stencil_values(base, fx, w, usedf, mass, v, affine, G, dx):
    """Yield (idx (N,), value (4, N)) per stencil offset (reference
    :346-353)."""
    mom = jnp.stack([mass * v[i] for i in range(3)])
    for (oi, oj, ok) in _OFFSETS:
        wi = w[oi, 0] * w[oj, 1] * w[ok, 2] * usedf
        dpos = jnp.stack([
            (oi - fx[0]) * dx, (oj - fx[1]) * dx, (ok - fx[2]) * dx
        ])
        contrib = mom + mv_soa(affine, dpos)
        val = jnp.stack([
            wi * contrib[0], wi * contrib[1], wi * contrib[2], wi * mass
        ])
        idx = (base[0] + oi) * (G * G) + (base[1] + oj) * G + (base[2] + ok)
        yield idx, val


def p2g_scatter(base, fx, w, usedf, mass, v, affine, G, dx):
    idxs, vals = [], []
    for idx, val in _stencil_values(base, fx, w, usedf, mass, v, affine, G, dx):
        idxs.append(idx)
        vals.append(val)
    idx = jnp.concatenate(idxs)          # (27N,)
    val = jnp.concatenate(vals, axis=1)  # (4, 27N)
    grid = jnp.zeros((4, G * G * G), val.dtype)
    # channelwise 1-D scatters keep everything lane-packed
    for c in range(4):
        grid = grid.at[c, idx].add(val[c])
    return grid


def p2g_sort(base, fx, w, usedf, mass, v, affine, G, dx):
    idxs, vals = [], []
    for idx, val in _stencil_values(base, fx, w, usedf, mass, v, affine, G, dx):
        idxs.append(idx)
        vals.append(val)
    idx = jnp.concatenate(idxs)
    val = jnp.concatenate(vals, axis=1)
    order = jnp.argsort(idx)
    idx_s = idx[order]
    rows = []
    for c in range(4):
        rows.append(
            jax.ops.segment_sum(
                val[c][order], idx_s, num_segments=G * G * G,
                indices_are_sorted=True,
            )
        )
    return jnp.stack(rows)


P2G_IMPLS = {
    "scatter": p2g_scatter,
    "sort": p2g_sort,
}


def get_p2g(name: str):
    if name == "pallas":
        import jax as _jax

        from fluidlab_tpu.ops.p2g_pallas import p2g_pallas

        def _pallas_auto(*args, **kw):
            # Mosaic kernels need a TPU; fall back to interpret elsewhere
            interpret = not str(_jax.devices()[0]).startswith("TPU")
            return p2g_pallas(*args, interpret=interpret, **kw)

        return _pallas_auto
    return P2G_IMPLS[name]
