"""Pallas block-binned P2G — the speed-of-light particle-grid transfer.

XLA lowers duplicate-index scatter on TPU to a global bitonic sort of all
27N stencil updates (~8.6 GB of sort traffic per substep at 65k
particles — measured via cost_analysis, see CLAUDE.md).  This kernel
replaces it with the classic binned formulation:

1. (XLA) bin particles by 16^3-cell block: one argsort of N keys
   (ops/binning.py, shared with the G2P kernel and hoistable to
   once-per-control-step under the persistent binning mode),
2. (Pallas) per block: DMA the block's particle slab from HBM, build the
   dense local stencil weights on the VPU, and accumulate
   ``W_block^T @ feats`` on the MXU into a VMEM-resident halo
   region — contraction dim = the particle chunk, a perfect MXU
   shape.  All tensors are built at fixed lane-padded shapes via constant
   index maps (no minor-dim reshapes, which Mosaic restricts),
3. (XLA) overlap-add the halo regions into the global grid with static
   slice-adds (no scatter).

The halo margin ``m`` widens the region from 18 (exact binning, base in
[block*16, block*16+16)) to 18+2m so the binning may be computed from
positions up to ``m`` cells stale — this lets engine/mpm.py bin once per
control step instead of once per substep and keep the particle state
itself sorted for the whole step (no per-substep permutation gathers).

The transfer value is affine in the target cell position
(val = w*(b + A x_cell), see ops/p2g.py ``dense``), so the kernel
accumulates the 13 per-particle coefficients [b | A | m] and the cell
contraction happens once at the end.

The op is linear in its feature inputs given the (non-differentiable)
cell assignment; the custom VJP runs the gather-free moment-backward
kernel (ops/transfer_bwd_pallas.py) — no scatter or gather in either
direction.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from fluidlab_tpu.core.mat3 import mv_soa
from fluidlab_tpu.ops.binning import (
    ALIGN,
    BLOCK,
    Binning,
    chunk_to_block,
    compute_binning,
)

HALO = 2         # quadratic B-spline writes base..base+2
CHUNK = ALIGN    # particles per grid step == the binning alignment, so
                 # a chunk never straddles two blocks
# feature-channel padding of the packed rows (13 real channels).  16 is
# the historical default; 13 drops a third lane tile from the kernel's
# (r2pad, region*CPAD) accumulator (288 -> 234 cols at m=0).  FL_CPAD:
# perf experiments.
CPAD = int(__import__("os").environ.get("FL_CPAD", "16"))
PACK = 128  # packed per-particle row: [wx(3) wy(3) wz(3) lbase(3) feats(13)]


def _region(m: int) -> int:
    """Halo region edge for binning-staleness margin ``m`` (cells)."""
    return BLOCK + HALO + 2 * m


def _dx_scale(G: int) -> float:
    """Cell-index -> world scale used by the position combine
    (x_cell = cell * dx; the engine always has dx = 1/G)."""
    return 1.0 / G


def _r2pad(m: int) -> int:
    r2 = _region(m) ** 2
    return ((r2 + 127) // 128) * 128


def _r2s(m: int) -> int:
    """ab extent padded to sublanes (8) — the transposed kernels
    (FL_KORIENT=cols) keep ab in the second-minor dim, where the tile
    constraint is 8, not 128: 324 -> 328 instead of 384 (15% less
    mask/reduction/dot work per chunk)."""
    r2 = _region(m) ** 2
    return ((r2 + 7) // 8) * 8


# kept as module constants for the exact (m=0) config, used by tests and
# by ops/g2p_pallas.py
REGION = _region(0)   # 18
R2 = REGION * REGION  # 324
R2PAD = _r2pad(0)     # 384
WCOLS = REGION * CPAD  # 288


@functools.lru_cache(maxsize=None)
def _make_accumulate(m: int):
    region = _region(m)
    r2 = region * region
    r2pad = _r2pad(m)
    wcols = region * CPAD

    def kernel(c2b_ref, packed_ref, out_ref, acc_ref):
        i = pl.program_id(0)
        nch = pl.num_programs(0)
        # accumulate in VMEM scratch; the out block is written ONCE per
        # block (chunk->block is non-decreasing), keeping the managed
        # out pipeline free of per-program read-modify-write chains
        first = jnp.where(
            i == 0, True, c2b_ref[i] != c2b_ref[jnp.maximum(i - 1, 0)]
        )
        last = jnp.where(
            i == nch - 1, True,
            c2b_ref[i] != c2b_ref[jnp.minimum(i + 1, nch - 1)],
        )

        @pl.when(first)
        def _():
            acc_ref[...] = jnp.zeros_like(acc_ref)

        # constant index maps, built in-kernel from iota (pallas kernels
        # may not capture host constants)
        col = jax.lax.broadcasted_iota(jnp.int32, (CHUNK, r2pad), 1)
        a_col = jnp.minimum(col // region, region - 1)
        b_col = col % region
        col_valid = (col < r2).astype(jnp.float32)
        wcol = jax.lax.broadcasted_iota(jnp.int32, (CHUNK, wcols), 1)
        c_wcol = wcol // CPAD
        # P[f, wcol] = (wcol % CPAD == f): tiles feats over the z-cells
        p_rows = jax.lax.broadcasted_iota(jnp.int32, (CPAD, wcols), 0)
        p_cols = jax.lax.broadcasted_iota(jnp.int32, (CPAD, wcols), 1)
        p_tile = (p_cols % CPAD == p_rows).astype(jnp.float32)

        pk = packed_ref[...]  # (CHUNK, PACK)
        wvals = (pk[:, 0:3], pk[:, 3:6], pk[:, 6:9])
        lvals = pk[:, 9:12].astype(jnp.int32)
        fvals = pk[:, 12:12 + CPAD]

        def onehot_w(w_axis, lb, cell_ids):
            # W[p, col] = w_axis[p, cell_ids[col] - lb[p]], offsets 0..2
            off = cell_ids - lb
            out = jnp.zeros(cell_ids.shape, jnp.float32)
            for o in range(3):
                out = out + jnp.where(off == o, w_axis[:, o:o + 1], 0.0)
            return out

        # T[p, col] = Wx(a(col)) * Wy(b(col)), zero outside r2.  Dummy
        # slots contribute zero: their feats are zeroed (used mask /
        # binning valid), so no per-chunk validity mask is needed.
        T = (
            onehot_w(wvals[0], lvals[:, 0:1], a_col)
            * onehot_w(wvals[1], lvals[:, 1:2], b_col)
            * col_valid
        )
        # W2[p, wcol] = Wz(c(wcol)) * feats[p, f(wcol)]
        from fluidlab_tpu.ops.masks import acc_dot

        feats_tiled = acc_dot(
            fvals, p_tile, (((1,), (0,)), ((), ()))
        )  # (CHUNK, wcols)
        W2 = onehot_w(wvals[2], lvals[:, 2:3], c_wcol) * feats_tiled

        acc_ref[...] += acc_dot(
            T, W2, (((0,), (0,)), ((), ()))
        )  # (r2pad, wcols)

        @pl.when(last)
        def _():
            out_ref[0] = acc_ref[...]

    def accumulate(packed, c2b, nb: int):
        nch = packed.shape[0] // CHUNK
        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(nch,),
            in_specs=[
                pl.BlockSpec((CHUNK, PACK), lambda i, c2b: (i, 0)),
            ],
            out_specs=pl.BlockSpec(
                (1, r2pad, wcols), lambda i, c2b: (c2b[i], 0, 0),
            ),
            scratch_shapes=[
                pltpu.VMEM((r2pad, wcols), jnp.float32),
            ],
        )
        return pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct(
                (nb * nb * nb, r2pad, wcols), jnp.float32
            ),
            grid_spec=grid_spec,
        )(c2b, packed)

    return accumulate


def _accumulate_blocks(packed, c2b, nb: int, m: int = 0):
    return _make_accumulate(m)(packed, c2b, nb)


# ------------------------------------------------------- overlap-add (XLA)

def _overlap_add(blocks, nb: int, G: int, m: int = 0, nchan: int = 13):
    """(NB^3, r2pad, wcols) halo accumulators -> (nchan, G^3) grid via
    static slice-adds (8 when m=0, 27 otherwise — the region of block b
    spans global cells [b*BLOCK - m, b*BLOCK - m + region))."""
    region = _region(m)
    r2 = region * region
    # channel-major throughout: (C, nb, nb, nb, R, R, R)
    r = blocks[:, :r2, :].reshape(
        nb, nb, nb, region, region, region, CPAD
    ).transpose(6, 0, 1, 2, 3, 4, 5)[:nchan]
    # axis parts: (region start, extent, global offset of the part)
    parts = [
        (0, m, -m),
        (m, BLOCK, 0),
        (m + BLOCK, HALO + m, BLOCK),
    ]
    parts = [p for p in parts if p[1] > 0]
    big = jnp.zeros(
        (nchan, G + 2 * BLOCK, G + 2 * BLOCK, G + 2 * BLOCK), jnp.float32
    )
    for (s_a, e_a, o_a) in parts:
        for (s_b, e_b, o_b) in parts:
            for (s_c, e_c, o_c) in parts:
                part = r[:, :, :, :,
                         s_a: s_a + e_a, s_b: s_b + e_b, s_c: s_c + e_c]
                # pad each part to BLOCK extent so the reshape flattens
                # (nb, BLOCK) into contiguous global cells
                part = jnp.pad(
                    part,
                    ((0, 0), (0, 0), (0, 0), (0, 0), (0, BLOCK - e_a),
                     (0, BLOCK - e_b), (0, BLOCK - e_c)),
                )
                flat = part.transpose(0, 1, 4, 2, 5, 3, 6).reshape(
                    nchan, nb * BLOCK, nb * BLOCK, nb * BLOCK
                )
                oa, ob, oc = BLOCK + o_a, BLOCK + o_b, BLOCK + o_c
                big = big.at[
                    :,
                    oa: oa + nb * BLOCK,
                    ob: ob + nb * BLOCK,
                    oc: oc + nb * BLOCK,
                ].add(flat)
    big = big[:, BLOCK: BLOCK + G, BLOCK: BLOCK + G, BLOCK: BLOCK + G]
    return big.reshape(nchan, G * G * G)


# ----------------------------------------------------------- the public op

@functools.partial(jax.custom_vjp, nondiff_argnums=(8, 9, 10, 11))
def _p2g_core(w, lbase_global, feats, order, valid, inv, starts, block,
              G: int, m: int, presorted: bool, interpret: bool):
    """grid13 = sum_p W_p(cell) * feats[p]; W from axis weights w and
    integer base cells.  Linear in feats; weights differentiable.

    ``order/valid/starts/block`` come from ops/binning.py
    (non-differentiable; order is the padded aligned layout).  With
    ``presorted=True`` the per-particle arrays are already in padded
    slot order and the permutation gather is skipped (dummy slots are
    assumed masked upstream via the used mask).
    """
    return _p2g_core_fwd(
        w, lbase_global, feats, order, valid, inv, starts, block, G, m,
        presorted, interpret,
    )[0]


def _p2g_core_impl(w, lbase_global, feats, order, valid, inv, starts,
                   block, G, m, presorted, interpret):
    """w (3 off, 3 ax, N), lbase_global (3, N) int32, feats (13, N)."""
    nb = G // BLOCK

    # local base within the (possibly stale) binning block, shifted by the
    # margin so one-hot offsets land in [0, region)
    lb = (lbase_global - block * BLOCK + m).astype(jnp.float32)  # (3, N)
    # assemble rows lane-packed (25, N), permute on the minor axis into
    # the padded aligned slot layout, pad to PACK rows, and transpose
    # ONCE into the kernel's (NPAD + 2*CHUNK, PACK) layout
    rows = jnp.concatenate(
        [w[:, 0], w[:, 1], w[:, 2], lb, feats], axis=0
    )  # (25, N)
    if not presorted:
        from fluidlab_tpu.ops.binning import pack_rows

        rows = pack_rows(rows, order, inv)  # (25, NPAD)
        # gather-packed dummy slots alias particle 0: kill their stencil
        # weights (scatter-packed dummies are already zero)
        rows = jnp.concatenate([rows[:3] * valid[None, :], rows[3:]], axis=0)
    rows = jnp.pad(rows, ((0, PACK - 25), (0, 0)))
    if presorted:
        from fluidlab_tpu.ops.binning import pin_rowmajor

        rows = pin_rowmajor(rows)  # stop {0,1} carry-layout propagation
    packed = rows.T  # (NPAD, PACK)
    c2b = chunk_to_block(starts, packed.shape[0])

    if interpret:
        with pltpu.force_tpu_interpret_mode():
            blocks = _accumulate_blocks(packed, c2b, nb, m)
    else:
        blocks = _accumulate_blocks(packed, c2b, nb, m)
    return _overlap_add(blocks, nb, G, m)


def _p2g_core_fwd(w, lbase_global, feats, order, valid, inv, starts, block,
                  G, m, presorted, interpret):
    out = _p2g_core_impl(
        w, lbase_global, feats, order, valid, inv, starts, block, G, m,
        presorted, interpret,
    )
    return out, (w, lbase_global, feats, order, valid, inv, starts, block)


def _p2g_core_bwd(G, m, presorted, interpret, res, gbar):
    """Transpose via the gather-free moment-backward kernel
    (ops/transfer_bwd_pallas.py): the grid cotangent (13, G^3) plays the
    channel grids, the forward features are the contraction
    coefficients."""
    from fluidlab_tpu.ops.transfer_bwd_pallas import transfer_bwd

    w, lbase, feats, order, valid, inv, starts, block = res
    d_feats, d_w = transfer_bwd(
        w, lbase, feats, gbar, order, valid, inv, starts, block,
        G, m, presorted, interpret,
    )
    return d_w, None, d_feats, None, None, None, None, None


_p2g_core.defvjp(_p2g_core_fwd, _p2g_core_bwd)


def p2g_pallas(base, fx, w, usedf, mass, v, affine, G, dx,
               interpret=False, binning: Binning | None = None,
               m: int = 0, presorted: bool = False):
    """Drop-in P2G (ops/p2g.py SoA interface) via the block-binned kernel.
    base/fx (3, N), w (3, 3, N), v (3, N), affine (9, N) -> (4, G^3)."""
    if binning is None:
        binning = compute_binning(base, G)
    x_p = (base.astype(v.dtype) + fx) * dx
    Ax = mv_soa(affine, x_p)
    b = jnp.stack([mass * v[i] - Ax[i] for i in range(3)])
    feats = jnp.concatenate(
        [b, affine, mass[None, :]], axis=0
    ) * usedf[None, :]  # (13, N)

    grid13 = _p2g_core(
        w, base, feats, binning.order, binning.valid, binning.inv,
        binning.starts, binning.block, G, m, presorted, interpret,
    )  # (13, G^3)

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
