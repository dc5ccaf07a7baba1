"""Pallas block-binned P2G — the speed-of-light particle-grid transfer.

XLA lowers duplicate-index scatter on TPU to a global bitonic sort of all
27N stencil updates (~8.6 GB of sort traffic per substep at 65k
particles — measured via cost_analysis, see CLAUDE.md).  This kernel
replaces it with the classic binned formulation:

1. (XLA) bin particles by 8^3-cell block: one argsort of N keys per
   substep (150x less sort traffic than 27N key+payload),
2. (Pallas) per block: DMA the block's particle slab from HBM, build the
   dense local stencil weights on the VPU, and accumulate
   ``W_block^T @ feats`` on the MXU into a VMEM-resident 10^3 halo
   region — contraction dim = the 128-particle chunk, a perfect MXU
   shape.  All tensors are built at fixed lane-padded shapes via constant
   index maps (no minor-dim reshapes, which Mosaic restricts),
3. (XLA) overlap-add the halo regions into the global grid with 8 static
   slice-adds (no scatter).

The transfer value is affine in the target cell position
(val = w*(b + A x_cell), see ops/p2g.py ``dense``), so the kernel
accumulates the 13 per-particle coefficients [b | A | m] and the cell
contraction happens once at the end.

The op is linear in its feature inputs given the (non-differentiable)
cell assignment, so the custom VJP is a 27-point gather of the grid
cotangent — pure fast XLA, no scatter in either direction.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from fluidlab_tpu.core.bspline import STENCIL
from fluidlab_tpu.core.mat3 import mv_soa

BLOCK = 16       # cells per block edge (64 blocks at G=64: amortizes
                 # per-program overhead; MXU waste still modest)
HALO = 2         # quadratic B-spline writes base..base+2
REGION = BLOCK + HALO  # 18
R2 = REGION * REGION   # 324
R2PAD = 384      # R2 padded to a lane multiple
CHUNK = 1024     # particles per MXU pass (large chunks amortize the
                 # per-iteration DMA/loop overhead that dominated at 128)
CPAD = 16        # feature channels padded (13 -> 16)
WCOLS = REGION * CPAD  # 288


PACK = 128  # packed per-particle row: [wx(3) wy(3) wz(3) lbase(3) feats(13)]


def _p2g_block_kernel(starts_ref, packed_ref, out_ref, acc_ref, slab, sem):
    b = pl.program_id(0)
    start = starts_ref[b]
    end = starts_ref[b + 1]
    n = end - start

    acc_ref[...] = jnp.zeros_like(acc_ref)

    # constant index maps, built in-kernel from iota (pallas kernels may
    # not capture host constants)
    col = jax.lax.broadcasted_iota(jnp.int32, (CHUNK, R2PAD), 1)
    a_col = jnp.minimum(col // REGION, REGION - 1)
    b_col = col % REGION
    col_valid = (col < R2).astype(jnp.float32)
    wcol = jax.lax.broadcasted_iota(jnp.int32, (CHUNK, WCOLS), 1)
    c_wcol = wcol // CPAD
    # P[f, wcol] = (wcol % CPAD == f): tiles feats over the z-cells
    p_rows = jax.lax.broadcasted_iota(jnp.int32, (CPAD, WCOLS), 0)
    p_cols = jax.lax.broadcasted_iota(jnp.int32, (CPAD, WCOLS), 1)
    p_tile = (p_cols % CPAD == p_rows).astype(jnp.float32)

    n_chunks = (n + CHUNK - 1) // CHUNK

    def dma(c, slot):
        return pltpu.make_async_copy(
            packed_ref.at[pl.ds(start + c * CHUNK, CHUNK)],
            slab.at[slot], sem.at[slot],
        )

    @pl.when(n_chunks > 0)
    def _():
        dma(0, 0).start()

    def chunk_body(c, _):
        slot = c % 2
        dma(c, slot).wait()

        @pl.when(c + 1 < n_chunks)
        def _():
            dma(c + 1, 1 - slot).start()

        valid = (
            jax.lax.broadcasted_iota(jnp.int32, (CHUNK, 1), 0) + c * CHUNK < n
        ).astype(jnp.float32)

        pk = slab[slot]  # (CHUNK, PACK)
        wvals = (pk[:, 0:3], pk[:, 3:6], pk[:, 6:9])
        lvals = pk[:, 9:12].astype(jnp.int32)
        fvals = pk[:, 12:12 + CPAD]

        def onehot_w(w_axis, lb, cell_ids):
            # W[p, col] = w_axis[p, cell_ids[col] - lb[p]] for offsets 0..2
            off = cell_ids - lb
            out = jnp.zeros(cell_ids.shape, jnp.float32)
            for o in range(3):
                out = out + jnp.where(off == o, w_axis[:, o:o + 1], 0.0)
            return out

        # T[p, col] = Wx(a(col)) * Wy(b(col)), zero outside R2 / past n
        T = (
            onehot_w(wvals[0], lvals[:, 0:1], a_col)
            * onehot_w(wvals[1], lvals[:, 1:2], b_col)
            * col_valid
            * valid
        )
        # W2[p, wcol] = Wz(c(wcol)) * feats[p, f(wcol)]
        feats_tiled = jax.lax.dot_general(
            fvals, p_tile, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # (CHUNK, WCOLS)
        W2 = onehot_w(wvals[2], lvals[:, 2:3], c_wcol) * feats_tiled

        acc_ref[...] += jax.lax.dot_general(
            T, W2, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # (R2PAD, WCOLS)
        return 0

    jax.lax.fori_loop(0, n_chunks, chunk_body, 0)
    out_ref[0, :, :] = acc_ref[...]


def _accumulate_blocks(packed, starts, nb: int):
    """pallas_call wrapper: packed sorted per-particle rows -> per-block
    halo accumulators (NB^3, R2PAD, WCOLS)."""
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(nb * nb * nb,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.ANY),
        ],
        out_specs=pl.BlockSpec(
            (1, R2PAD, WCOLS), lambda b, *_: (b, 0, 0),
            memory_space=pltpu.VMEM,
        ),
        scratch_shapes=[
            pltpu.VMEM((R2PAD, WCOLS), jnp.float32),
            pltpu.VMEM((2, CHUNK, PACK), jnp.float32),
            pltpu.SemaphoreType.DMA((2,)),
        ],
    )
    return pl.pallas_call(
        _p2g_block_kernel,
        out_shape=jax.ShapeDtypeStruct(
            (nb * nb * nb, R2PAD, WCOLS), jnp.float32
        ),
        grid_spec=grid_spec,
    )(starts, packed)


# ------------------------------------------------------- overlap-add (XLA)

def _overlap_add(blocks, nb: int, G: int):
    """(NB^3, R2PAD, WCOLS) halo accumulators -> (G^3, CPAD) grid via 8
    static slice-adds."""
    # channel-major throughout: (C, nb, nb, nb, R, R, R)
    r = blocks[:, :R2, :].reshape(
        nb, nb, nb, REGION, REGION, REGION, CPAD
    ).transpose(6, 0, 1, 2, 3, 4, 5)
    # halo parts are zero-padded to BLOCK extent before the flatten, so
    # the target must leave room for a full extra block per axis
    big = jnp.zeros((CPAD, G + BLOCK, G + BLOCK, G + BLOCK), jnp.float32)
    for qa in (0, 1):
        for qb in (0, 1):
            for qc in (0, 1):
                sa = slice(0, BLOCK) if qa == 0 else slice(BLOCK, REGION)
                sb = slice(0, BLOCK) if qb == 0 else slice(BLOCK, REGION)
                sc = slice(0, BLOCK) if qc == 0 else slice(BLOCK, REGION)
                part = r[:, :, :, :, sa, sb, sc]
                ea = BLOCK if qa == 0 else HALO
                eb = BLOCK if qb == 0 else HALO
                ec = BLOCK if qc == 0 else HALO
                part = jnp.pad(
                    part,
                    ((0, 0), (0, 0), (0, 0), (0, 0), (0, BLOCK - ea),
                     (0, BLOCK - eb), (0, BLOCK - ec)),
                )
                flat = part.transpose(0, 1, 4, 2, 5, 3, 6).reshape(
                    CPAD, nb * BLOCK, nb * BLOCK, nb * BLOCK
                )
                oa, ob, oc = qa * BLOCK, qb * BLOCK, qc * BLOCK
                big = big.at[
                    :,
                    oa: oa + nb * BLOCK,
                    ob: ob + nb * BLOCK,
                    oc: oc + nb * BLOCK,
                ].add(flat)
    return big[:, :G, :G, :G].reshape(CPAD, G * G * G)


# ----------------------------------------------------------- the public op

@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4))
def _p2g_core(w, lbase_global, feats, G: int, interpret: bool):
    """grid13 = sum_p W_p(cell) * feats[p]; W from axis weights w and
    integer base cells.  Linear in feats; weights differentiable."""
    return _p2g_core_fwd(w, lbase_global, feats, G, interpret)[0]


def _p2g_core_impl(w, lbase_global, feats, G, interpret):
    """w (3 off, 3 ax, N), lbase_global (3, N) int32, feats (13, N)."""
    import os as _os

    _ablate = set(filter(None, _os.environ.get("FL_ABLATE", "").split(",")))
    N = w.shape[-1]
    nb = G // BLOCK
    block = lbase_global // BLOCK  # (3, N)
    block_id = (block[0] * nb + block[1]) * nb + block[2]
    if "noperm" in _ablate:  # timing probe: identity binning (WRONG results)
        order = jnp.arange(N, dtype=jnp.int32)
        block_id = jnp.sort(block_id)
    else:
            order = jnp.argsort(block_id)
    sorted_bid = block_id if "noperm" in _ablate else block_id[order]
    starts = jnp.searchsorted(
        sorted_bid, jnp.arange(nb * nb * nb + 1, dtype=jnp.int32)
    ).astype(jnp.int32)

    lb = (lbase_global - block * BLOCK).astype(jnp.float32)  # (3, N)
    # assemble rows lane-packed (25, N), permute on the minor axis, pad to
    # PACK rows, and transpose ONCE into the kernel's (Npad, PACK) layout
    rows = jnp.concatenate(
        [w[:, 0], w[:, 1], w[:, 2], lb, feats], axis=0
    )[:, order]  # (25, N)
    rows = jnp.pad(rows, ((0, PACK - 25), (0, 2 * CHUNK)))
    packed = rows.T  # (N + 2*CHUNK, PACK)

    if interpret:
        with pltpu.force_tpu_interpret_mode():
            blocks = _accumulate_blocks(packed, starts, nb)
    else:
        blocks = _accumulate_blocks(packed, starts, nb)
    return _overlap_add(blocks, nb, G)[:13]


def _p2g_core_fwd(w, lbase_global, feats, G, interpret):
    out = _p2g_core_impl(w, lbase_global, feats, G, interpret)
    return out, (w, lbase_global, feats)


def _p2g_core_bwd(G, interpret, res, gbar):
    """Transpose: 27-point gathers of the grid cotangent (fast XLA)."""
    w, lbase, feats = res
    gb = gbar  # (13, G^3)
    d_w = jnp.zeros_like(w)
    d_feats = jnp.zeros_like(feats)
    for (oi, oj, ok) in [tuple(int(v) for v in o) for o in STENCIL]:
        idx = (
            (lbase[0] + oi) * (G * G)
            + (lbase[1] + oj) * G
            + (lbase[2] + ok)
        )
        gc = gb[:, idx]  # (13, N)
        e = jnp.sum(gc * feats, axis=0)  # (N,)
        wprod = w[oi, 0] * w[oj, 1] * w[ok, 2]
        d_feats = d_feats + wprod[None, :] * gc
        d_w = d_w.at[oi, 0].add(w[oj, 1] * w[ok, 2] * e)
        d_w = d_w.at[oj, 1].add(w[oi, 0] * w[ok, 2] * e)
        d_w = d_w.at[ok, 2].add(w[oi, 0] * w[oj, 1] * e)
    return d_w, None, d_feats


_p2g_core.defvjp(_p2g_core_fwd, _p2g_core_bwd)


def p2g_pallas(base, fx, w, usedf, mass, v, affine, G, dx, interpret=False):
    """Drop-in P2G (ops/p2g.py SoA interface) via the block-binned kernel.
    base/fx (3, N), w (3, 3, N), v (3, N), affine (9, N) -> (4, G^3)."""
    x_p = (base.astype(v.dtype) + fx) * dx
    Ax = mv_soa(affine, x_p)
    b = jnp.stack([mass * v[i] - Ax[i] for i in range(3)])
    feats = jnp.concatenate(
        [b, affine, mass[None, :]], axis=0
    ) * usedf[None, :]  # (13, N)

    grid13 = _p2g_core(w, base, feats, G, interpret)  # (13, G^3)

    ii = jax.lax.broadcasted_iota(jnp.int32, (G, G, G), 0)
    jj = jax.lax.broadcasted_iota(jnp.int32, (G, G, G), 1)
    kk = jax.lax.broadcasted_iota(jnp.int32, (G, G, G), 2)
    x_cell = jnp.stack(
        [ii.reshape(-1), jj.reshape(-1), kk.reshape(-1)]
    ).astype(v.dtype) * dx  # (3, G^3)
    mom = jnp.stack([
        grid13[i] + sum(grid13[3 + 3 * i + k] * x_cell[k] for k in range(3))
        for i in range(3)
    ])
    return jnp.concatenate([mom, grid13[12:13]], axis=0)


def p2g_pallas_interpret(base, fx, w, usedf, mass, v, affine, G, dx):
    return p2g_pallas(base, fx, w, usedf, mass, v, affine, G, dx,
                      interpret=True)
