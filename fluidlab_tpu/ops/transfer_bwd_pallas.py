"""Gather-free backward pass for the particle-grid transfers.

Both transfer VJPs need, per particle, contractions of grid values
against the 27-point stencil:

    d_feats[c, p] = sum_o  wprod_o            * gb[c, cell_o(p)]
    d_w[o, ax, p] = sum_c feats[c, p] * M_c[o, ax, p]
    M_c[o, ax, p] = sum_{cells: off_ax = o} (prod of other-axis weights)
                    * gb[c, cell]

As 27-point gathers these cost ~16-30 ms/substep on TPU (RESULTS.md);
this kernel computes them with the same block-binned dense-moment
machinery as the forward G2P (ops/g2p_pallas.py): per chunk of 128
block-sorted particles, the C-channel halo region is contracted on the
MXU with the z-axis weights (and z one-hot *indicators* for the z-axis
marginals), then reduced against seven shared (a, b)-plane masks
(T = WxWy, Ix_o*Wy, Wx*Iy_o).

The same kernel serves both VJPs:
- P2G backward: C = 13 channel grids = the grid cotangent; feats = the
  forward features -> (d_feats, d_w) directly.
- G2P backward (d_w only): the output cotangents contract as
  e(cell) = sum_i g_i (S0bar_i + sum_d S1bar_id cell_d), which is the
  same form with C = 12 channel grids [g_i | g_i * cell_d] and
  feats = [S0bar | S1bar].

Reference semantics: mpm_simulator.py:306-426 (the transfer kernels
whose Taichi autodiff tape this replaces).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

import os as _os

from fluidlab_tpu.ops.binning import ALIGN, BLOCK, chunk_to_block
from fluidlab_tpu.ops.g2p_pallas import RCOLS, _build_regions
from fluidlab_tpu.ops.p2g_pallas import _r2pad, _region

CHUNK = ALIGN
PACKB = 128  # packed row: w(9) lb(3) feats(C<=16)
OUTB = 128   # output row: d_feats(C) | d_w(9), ax-major

# kernel structure: 'v2' = one stacked MXU contraction ([Wz|Iz0..2] x
# flat region) + feats-contraction-first VPU reductions; 'v1' = the
# original per-channel dot loop (4C small dots).  v2 measured faster on
# TPU; v1 kept as a fallback knob.
_IMPL = _os.environ.get("FL_BWD_IMPL", "v2")


@functools.lru_cache(maxsize=None)
def _make_bwd_kernel(m: int, C: int):
    region = _region(m)
    r2 = region * region
    r2pad = _r2pad(m)

    def kernel(c2b_ref, packed_ref, regions_ref, out_ref):
        del c2b_ref
        rvals = regions_ref[0]  # (C, r2, RCOLS)

        col = jax.lax.broadcasted_iota(jnp.int32, (CHUNK, r2pad), 1)
        a_col = jnp.minimum(col // region, region - 1)
        b_col = col % region
        col_valid = (col < r2).astype(jnp.float32)
        zcol = jax.lax.broadcasted_iota(jnp.int32, (CHUNK, RCOLS), 1)
        z_valid = (zcol < region).astype(jnp.float32)

        pk = packed_ref[...]  # (CHUNK, PACKB)
        wvals = (pk[:, 0:3], pk[:, 3:6], pk[:, 6:9])
        lvals = pk[:, 9:12].astype(jnp.int32)
        fvals = pk[:, 12:12 + C]  # (CHUNK, C)

        def onehot(w_axis, lb, ids, valid):
            off = ids - lb
            out = jnp.zeros(ids.shape, jnp.float32)
            for o in range(3):
                out = out + jnp.where(off == o, w_axis[:, o:o + 1], 0.0)
            return out * valid

        def indicator(lb, ids, o, valid):
            return (ids - lb == o).astype(jnp.float32) * valid

        Wz = onehot(wvals[2], lvals[:, 2:3], zcol, z_valid)
        Wx = onehot(wvals[0], lvals[:, 0:1], a_col, col_valid)
        Wy = onehot(wvals[1], lvals[:, 1:2], b_col, col_valid)
        T = Wx * Wy
        # shared (a, b)-plane masks for the axis-0/1 marginals
        IxWy = [
            indicator(lvals[:, 0:1], a_col, o, col_valid) * Wy
            for o in range(3)
        ]
        WxIy = [
            Wx * indicator(lvals[:, 1:2], b_col, o, col_valid)
            for o in range(3)
        ]
        Iz = [
            indicator(lvals[:, 2:3], zcol, o, z_valid) for o in range(3)
        ]

        d_feats = []
        dw = [jnp.zeros((CHUNK,), jnp.float32) for _ in range(9)]
        for c in range(C):
            R_c = rvals[c]  # (r2, RCOLS)
            gz = jax.lax.dot_general(
                Wz, R_c, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            )  # (CHUNK, r2)
            gz = jnp.pad(gz, ((0, 0), (0, r2pad - r2)))
            fc = fvals[:, c]
            d_feats.append(jnp.sum(T * gz, axis=1))
            for o in range(3):
                dw[0 * 3 + o] += fc * jnp.sum(IxWy[o] * gz, axis=1)
                dw[1 * 3 + o] += fc * jnp.sum(WxIy[o] * gz, axis=1)
                gzo = jax.lax.dot_general(
                    Iz[o], R_c, (((1,), (1,)), ((), ())),
                    preferred_element_type=jnp.float32,
                )
                gzo = jnp.pad(gzo, ((0, 0), (0, r2pad - r2)))
                dw[2 * 3 + o] += fc * jnp.sum(T * gzo, axis=1)

        rows = jnp.stack(d_feats + dw, axis=1)  # (CHUNK, C + 9)
        out_ref[...] = jnp.pad(rows, ((0, 0), (0, OUTB - (C + 9))))

    def run(packed, regions, c2b, nb: int, n_pad: int):
        nch = packed.shape[0] // CHUNK
        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(nch,),
            in_specs=[
                pl.BlockSpec((CHUNK, PACKB), lambda i, c2b: (i, 0)),
                pl.BlockSpec(
                    (1, C, r2, RCOLS), lambda i, c2b: (c2b[i], 0, 0, 0)
                ),
            ],
            out_specs=pl.BlockSpec((CHUNK, OUTB), lambda i, c2b: (i, 0)),
        )
        return pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct((n_pad, OUTB), jnp.float32),
            grid_spec=grid_spec,
        )(c2b, packed, regions)

    return run


@functools.lru_cache(maxsize=None)
def _make_bwd_kernel_v2(m: int, C: int):
    """Restructured moment-backward kernel:

    - ONE stacked MXU contraction: lhs = [Wz | Iz0 | Iz1 | Iz2]
      (4*CHUNK, RCOLS) against the channel-flattened region
      (C*r2pad, RCOLS) -> all z-contractions of all channels in a
      single dot (the v1 kernel issued 4C separate small dots);
    - feats-contraction-first: d_w reductions run against the
      f-contracted planes GZf/GZOf (CHUNK, r2pad) instead of per
      channel, cutting the VPU reduction work ~C-fold.

    Regions must be the ab-padded flat layout from
    ``_build_regions_flat`` (zero padding keeps padded ab/z columns
    inert).
    """
    region = _region(m)
    r2 = region * region
    r2pad = _r2pad(m)
    CR = C * r2pad

    def kernel(c2b_ref, packed_ref, regions_ref, out_ref):
        del c2b_ref
        rflat = regions_ref[0]  # (C*r2pad, RCOLS)

        col = jax.lax.broadcasted_iota(jnp.int32, (CHUNK, r2pad), 1)
        a_col = jnp.minimum(col // region, region - 1)
        b_col = col % region
        col_valid = (col < r2).astype(jnp.float32)
        zcol = jax.lax.broadcasted_iota(jnp.int32, (CHUNK, RCOLS), 1)
        z_valid = (zcol < region).astype(jnp.float32)

        pk = packed_ref[...]  # (CHUNK, PACKB)
        wvals = (pk[:, 0:3], pk[:, 3:6], pk[:, 6:9])
        lvals = pk[:, 9:12].astype(jnp.int32)
        fvals = pk[:, 12:12 + C]  # (CHUNK, C)

        def onehot(w_axis, lb, ids, valid):
            off = ids - lb
            out = jnp.zeros(ids.shape, jnp.float32)
            for o in range(3):
                out = out + jnp.where(off == o, w_axis[:, o:o + 1], 0.0)
            return out * valid

        def indicator(lb, ids, o, valid):
            return (ids - lb == o).astype(jnp.float32) * valid

        Wz = onehot(wvals[2], lvals[:, 2:3], zcol, z_valid)
        Iz = [indicator(lvals[:, 2:3], zcol, o, z_valid) for o in range(3)]
        Wx = onehot(wvals[0], lvals[:, 0:1], a_col, col_valid)
        Wy = onehot(wvals[1], lvals[:, 1:2], b_col, col_valid)
        T = Wx * Wy

        # one stacked contraction over z for all channels
        lhs = jnp.concatenate([Wz] + Iz, axis=0)  # (4*CHUNK, RCOLS)
        ZC = jax.lax.dot_general(
            lhs, rflat, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # (4*CHUNK, C*r2pad)
        GZ = ZC[0 * CHUNK:1 * CHUNK]

        # d_feats[c] = sum_ab T * GZ_c; GZf = sum_c f_c GZ_c
        d_feats = []
        GZf = jnp.zeros((CHUNK, r2pad), jnp.float32)
        for c in range(C):
            GZc = GZ[:, c * r2pad:(c + 1) * r2pad]
            d_feats.append(jnp.sum(T * GZc, axis=1))
            GZf = GZf + fvals[:, c:c + 1] * GZc

        dw = []
        for o in range(3):  # axis 0 marginals: Ix_o Wy against GZf
            dw.append(jnp.sum(
                indicator(lvals[:, 0:1], a_col, o, col_valid) * Wy * GZf,
                axis=1,
            ))
        for o in range(3):  # axis 1 marginals
            dw.append(jnp.sum(
                Wx * indicator(lvals[:, 1:2], b_col, o, col_valid) * GZf,
                axis=1,
            ))
        for o in range(3):  # axis 2 marginals: T against GZOf_o
            GZO = ZC[(1 + o) * CHUNK:(2 + o) * CHUNK]
            GZOf = jnp.zeros((CHUNK, r2pad), jnp.float32)
            for c in range(C):
                GZOf = GZOf + fvals[:, c:c + 1] * GZO[
                    :, c * r2pad:(c + 1) * r2pad
                ]
            dw.append(jnp.sum(T * GZOf, axis=1))

        rows = jnp.stack(d_feats + dw, axis=1)  # (CHUNK, C + 9)
        out_ref[...] = jnp.pad(rows, ((0, 0), (0, OUTB - (C + 9))))

    def run(packed, regions, c2b, nb: int, n_pad: int):
        nch = packed.shape[0] // CHUNK
        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(nch,),
            in_specs=[
                pl.BlockSpec((CHUNK, PACKB), lambda i, c2b: (i, 0)),
                pl.BlockSpec(
                    (1, CR, RCOLS), lambda i, c2b: (c2b[i], 0, 0)
                ),
            ],
            out_specs=pl.BlockSpec((CHUNK, OUTB), lambda i, c2b: (i, 0)),
        )
        return pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct((n_pad, OUTB), jnp.float32),
            grid_spec=grid_spec,
        )(c2b, packed, regions)

    return run


def _build_regions_flat(grids, G: int, nb: int, m: int):
    """(C, G^3) -> (NB^3, C*r2pad, RCOLS): the v2 kernel's ab-padded
    channel-flattened halo regions (padding rows are zero, so padded
    ab/z columns contribute nothing to the contractions)."""
    r2 = _region(m) ** 2
    r2pad = _r2pad(m)
    r = _build_regions(grids, G, nb, m)  # (NB^3, C, r2, RCOLS)
    r = jnp.pad(r, ((0, 0), (0, 0), (0, r2pad - r2), (0, 0)))
    return r.reshape(r.shape[0], r.shape[1] * r2pad, RCOLS)


def transfer_bwd(w, base, feats, grids, order, valid, inv, starts, block,
                 G: int, m: int, presorted: bool, interpret: bool,
                 regions_flat=None, n_chan: int | None = None):
    """(d_feats (C, N), d_w (3 off, 3 ax, N)) for a stencil transfer
    whose cotangent contracts as sum_c feats[c] * grids[c, cell].

    ``grids`` (C, G^3) channel grids (C <= 16); binning arrays from
    ops/binning.py (order is the padded aligned layout).

    Region-space callers (ops/regions_pallas.py) that already hold the
    channel grids in per-block flat layout pass ``regions_flat``
    ((NB^3, n_chan*r2pad, RCOLS), grids=None) — the canonical-grid
    rebuild is skipped and the v2 kernel consumes them directly.
    """
    C = n_chan if regions_flat is not None else grids.shape[0]
    N = w.shape[-1]
    npad = N if presorted else order.shape[0]
    nb = G // BLOCK

    lb = (base - block * BLOCK + m).astype(jnp.float32)
    rows = jnp.concatenate(
        [w[:, 0], w[:, 1], w[:, 2], lb, feats], axis=0
    )  # (12 + C, N)
    if not presorted:
        from fluidlab_tpu.ops.binning import pack_rows

        rows = pack_rows(rows, order, inv)
    rows = jnp.pad(rows, ((0, PACKB - 12 - C), (0, 0)))
    packed = rows.T  # (NPAD, PACKB)
    c2b = chunk_to_block(starts, npad)

    if regions_flat is not None:
        regions = regions_flat
        fn = _make_bwd_kernel_v2(m, C)
    elif _IMPL == "v2":
        regions = _build_regions_flat(grids, G, nb, m)
        fn = _make_bwd_kernel_v2(m, C)
    else:
        regions = _build_regions(grids, G, nb, m)
        fn = _make_bwd_kernel(m, C)
    if interpret:
        with pltpu.force_tpu_interpret_mode():
            out = fn(packed, regions, c2b, nb, npad)
    else:
        out = fn(packed, regions, c2b, nb, npad)

    res = out[:npad, :C + 9]
    if not presorted:
        from fluidlab_tpu.ops.binning import unpack_rows

        res = unpack_rows(res, order, valid, inv)
    res_t = res.T  # (C + 9, N)
    d_feats = res_t[:C]
    d_w = res_t[C:].reshape(3, 3, -1).transpose(1, 0, 2)  # (off, ax, N)
    return d_feats, d_w
