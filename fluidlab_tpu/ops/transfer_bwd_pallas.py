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
from fluidlab_tpu.ops.masks import acc_dot as _masks_acc_dot
from fluidlab_tpu.ops.masks import grad_dot_mode as _grad_dot_mode


def _acc_dot(a, b, dims):
    # backward-kernel dots run at the FL_GRAD_DOT strategy (gradients
    # tolerate more relative noise than primal state; RESULTS.md r2)
    return _masks_acc_dot(a, b, dims, mode=_grad_dot_mode())

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
            gz = _acc_dot(Wz, R_c, (((1,), (1,)), ((), ())))  # (CHUNK, r2)
            gz = jnp.pad(gz, ((0, 0), (0, r2pad - r2)))
            fc = fvals[:, c]
            d_feats.append(jnp.sum(T * gz, axis=1))
            for o in range(3):
                dw[0 * 3 + o] += fc * jnp.sum(IxWy[o] * gz, axis=1)
                dw[1 * 3 + o] += fc * jnp.sum(WxIy[o] * gz, axis=1)
                gzo = _acc_dot(Iz[o], R_c, (((1,), (1,)), ((), ())))
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
        ZC = _acc_dot(lhs, rflat, (((1,), (1,)), ((), ())))  # (4*CHUNK, C*r2pad)
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


@functools.lru_cache(maxsize=None)
def _make_bwd_kernel_v3(m: int, nq: int, has_mass: bool,
                        need_dfeats: bool, scale: float, nb: int):
    """Compact-channel moment-backward kernel returning d_fx directly.

    The v2 kernel contracts C in {12, 13} *coordinate-expanded* channel
    grids against 4 z-stencils per chunk — a (4*CHUNK, C*r2pad) MXU
    contraction that dominates the whole backward (~11 ms/substep per
    call at 65k, RESULTS.md).  But those C channels are built from only
    nq (+mass) independent grids R_q with per-cell coordinate factors:

        F_p(cell) = sum_q (c0_q + sum_d c_{q,d} x_d(cell)) R_q(cell)
                    [+ m_c R_m(cell)],   x_d = (origin_d + local_d)*scale

    (P2G bwd: R = the 4-channel grid cotangent, c0 = b, c = A, m_c =
    mass; G2P d_w: R = the 3 velocity grids, c0 = S0bar, c = S1bar.)
    And the 9 weight cotangents d_w[ax, o] are only ever consumed as
    d_fx[ax] = sum_o d_w[ax, o] * spline'_o(fx_ax) — so contracting
    against *derivative-weight* stencils W'ax collapses the 9 indicator
    marginals to 3:

        d_fx[ax, p] = sum_cells (d wprod / d fx_ax)(cell) F_p(cell)

    MXU work per chunk drops from (4*CHUNK) x (13*r2pad) x RCOLS to
    nqt dots of (4*CHUNK) x r2 x RCOLS — ~6.5x fewer FLOPs — and the
    consumers (unsweep combine-adjoint expansion, the G2P-bwd grids12
    build) shrink to plain de-interleaves.

    packed rows: w(9) wp(9) lb(3) feats(C); regions (1, nqt, r2, RCOLS)
    (the forward G2P region layout — G2P bwd passes its vregions
    verbatim).  out rows: [d_feats(C) | d_fx(3)].
    """
    region = _region(m)
    r2 = region * region
    r2pad = _r2pad(m)
    nqt = nq + (1 if has_mass else 0)
    C = 4 * nq + (1 if has_mass else 0)

    def kernel(c2b_ref, packed_ref, regions_ref, out_ref):
        i = pl.program_id(0)
        b = c2b_ref[i]
        bj = (b // nb) % nb
        bk = b % nb
        oa_cells = ((b // (nb * nb)) * BLOCK - m).astype(jnp.float32)
        ob_cells = (bj * BLOCK - m).astype(jnp.float32)
        oz_cells = (bk * BLOCK - m).astype(jnp.float32)

        col = jax.lax.broadcasted_iota(jnp.int32, (CHUNK, r2pad), 1)
        a_col = jnp.minimum(col // region, region - 1)
        b_col = col % region
        col_valid = (col < r2).astype(jnp.float32)
        zcol = jax.lax.broadcasted_iota(jnp.int32, (CHUNK, RCOLS), 1)
        z_valid = (zcol < region).astype(jnp.float32)
        # global scaled coordinates of the region's cells
        xag = (oa_cells + a_col.astype(jnp.float32)) * scale
        xbg = (ob_cells + b_col.astype(jnp.float32)) * scale
        xzg = (oz_cells + zcol.astype(jnp.float32)) * scale

        pk = packed_ref[...]  # (CHUNK, PACKB)
        wvals = (pk[:, 0:3], pk[:, 3:6], pk[:, 6:9])
        dvals = (pk[:, 9:12], pk[:, 12:15], pk[:, 15:18])
        lvals = pk[:, 18:21].astype(jnp.int32)
        fvals = pk[:, 21:21 + C]

        def onehot(w_axis, lb, ids, valid):
            off = ids - lb
            out = jnp.zeros(ids.shape, jnp.float32)
            for o in range(3):
                out = out + jnp.where(off == o, w_axis[:, o:o + 1], 0.0)
            return out * valid

        Wz = onehot(wvals[2], lvals[:, 2:3], zcol, z_valid)
        Dz = onehot(dvals[2], lvals[:, 2:3], zcol, z_valid)
        lhs = jnp.concatenate([Wz, Wz * xzg, Dz, Dz * xzg], axis=0)

        GZ, GZX, DZ, DZX = [], [], [], []
        for q in range(nqt):
            zc = _acc_dot(lhs, regions_ref[0, q], (((1,), (1,)), ((), ())))  # (4*CHUNK, r2)
            zc = jnp.pad(zc, ((0, 0), (0, r2pad - r2)))
            GZ.append(zc[0 * CHUNK:1 * CHUNK])
            GZX.append(zc[1 * CHUNK:2 * CHUNK])
            DZ.append(zc[2 * CHUNK:3 * CHUNK])
            DZX.append(zc[3 * CHUNK:4 * CHUNK])

        Wx = onehot(wvals[0], lvals[:, 0:1], a_col, col_valid)
        Wy = onehot(wvals[1], lvals[:, 1:2], b_col, col_valid)
        T = Wx * Wy

        rows = []
        if need_dfeats:
            Ta = T * xag
            Tb = T * xbg
            rows += [jnp.sum(T * GZ[q], axis=1) for q in range(nq)]
            for q in range(nq):
                rows += [jnp.sum(Ta * GZ[q], axis=1),
                         jnp.sum(Tb * GZ[q], axis=1),
                         jnp.sum(T * GZX[q], axis=1)]
            if has_mass:
                rows.append(jnp.sum(T * GZ[nq], axis=1))
        else:
            rows += [jnp.zeros((CHUNK,), jnp.float32)] * C

        # feats-contracted z-profiles of F (and of its W'z contraction)
        def fprofile(Z, ZX):
            P0 = jnp.zeros((CHUNK, r2pad), jnp.float32)
            Pa = jnp.zeros((CHUNK, r2pad), jnp.float32)
            Pb = jnp.zeros((CHUNK, r2pad), jnp.float32)
            for q in range(nq):
                P0 = P0 + fvals[:, q:q + 1] * Z[q]
                P0 = P0 + fvals[:, nq + 3 * q + 2:nq + 3 * q + 3] * ZX[q]
                Pa = Pa + fvals[:, nq + 3 * q:nq + 3 * q + 1] * Z[q]
                Pb = Pb + fvals[:, nq + 3 * q + 1:nq + 3 * q + 2] * Z[q]
            if has_mass:
                P0 = P0 + fvals[:, 4 * nq:4 * nq + 1] * Z[nq]
            return P0 + xag * Pa + xbg * Pb

        FZ = fprofile(GZ, GZX)
        FD = fprofile(DZ, DZX)
        Dx = onehot(dvals[0], lvals[:, 0:1], a_col, col_valid)
        Dy = onehot(dvals[1], lvals[:, 1:2], b_col, col_valid)
        rows += [
            jnp.sum(Dx * Wy * FZ, axis=1),
            jnp.sum(Wx * Dy * FZ, axis=1),
            jnp.sum(T * FD, axis=1),
        ]

        out = jnp.stack(rows, axis=1)  # (CHUNK, C + 3)
        out_ref[...] = jnp.pad(out, ((0, 0), (0, OUTB - (C + 3))))

    def run(packed, regions, c2b, n_pad: int):
        nch = packed.shape[0] // CHUNK
        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(nch,),
            in_specs=[
                pl.BlockSpec((CHUNK, PACKB), lambda i, c2b: (i, 0)),
                pl.BlockSpec(
                    (1, nqt, r2, RCOLS), lambda i, c2b: (c2b[i], 0, 0, 0)
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
def _make_bwd_kernel_merged(m: int, nb: int, scale_p: float, cpad: int,
                            use_mxu: bool):
    """Fused moment-backward for the whole region grid phase: ONE kernel
    serves both transfer VJPs of a substep (see
    ops/regions_pallas.py make_grid_phase).

    The two v3 calls (P2G bwd against the compact 4-channel cotangent
    regions at scale=dx; G2P d_fx against the 3 velocity regions at
    scale=1) share everything per chunk except the region operand: the
    six weight/derivative one-hot masks, the z-stencil lhs
    [Wz | Wz*z | W'z | W'z*z], and — because d_fx is linear in the
    contracted grid — even the final mask reductions (the two sides'
    feats-contracted profiles FZ/FD are summed before reduction).
    Merging halves the VPU mask-build work and removes one kernel
    launch + packed-row prologue per substep.

    Coordinates are built once in cell units (scale 1, the G2P side's
    frame); the P2G side's world-scale factors (scale_p = dx) multiply
    the static coordinate lattices and its z-moment contractions.

    packed row layout (cols): w(9) lb(3) feats12(12) pad(cpad-12)
    wp(9) feats13(13); out rows: [d_feats13(13) | d_fx(3)].
    """
    from fluidlab_tpu.ops.masks import (
        _consts_np,
        make_ew,
        mm_ew,
    )

    region = _region(m)
    r2 = region * region
    r2pad = _r2pad(m)
    OWP = 12 + cpad
    OF13 = 21 + cpad

    def kernel(c2b_ref, act_ref, packed_ref, compact_ref, vreg_ref, *rest):
        out_ref = rest[-1]
        i = pl.program_id(0)

        # all-dummy chunks (CSR padding): zero the out rows, skip the
        # mask builds and the 7-channel stacked contraction
        @pl.when(act_ref[i] == 0)
        def _():
            out_ref[...] = jnp.zeros_like(out_ref)

        @pl.when(act_ref[i] != 0)
        def _():
            _mbody(c2b_ref, packed_ref, compact_ref, vreg_ref, rest)

    def _mbody(c2b_ref, packed_ref, compact_ref, vreg_ref, rest):
        out_ref = rest[-1]
        i = pl.program_id(0)
        b = c2b_ref[i]
        bj = (b // nb) % nb
        bk = b % nb
        oa = ((b // (nb * nb)) * BLOCK - m).astype(jnp.float32)
        ob = (bj * BLOCK - m).astype(jnp.float32)
        oz = (bk * BLOCK - m).astype(jnp.float32)

        pk = packed_ref[...]  # (CHUNK, PACKB)
        wvals = (pk[:, 0:3], pk[:, 3:6], pk[:, 6:9])
        f12 = pk[:, 12:24]    # [S0bar(3) | S1bar(9)]
        dvals = (pk[:, OWP:OWP + 3], pk[:, OWP + 3:OWP + 6],
                 pk[:, OWP + 6:OWP + 9])
        f13 = pk[:, OF13:OF13 + 13]  # [b(3) | affine(9) | mass(1)]

        def onehot(w_axis, lb, ids, valid):
            off = ids - lb
            out = jnp.zeros(ids.shape, jnp.float32)
            for o in range(3):
                out = out + jnp.where(off == o, w_axis[:, o:o + 1], 0.0)
            return out * valid

        if use_mxu:
            cm = rest[0][...]
            a_colf = cm[256:257]
            b_colf = cm[257:258]
            zcolf = cm[259:260, :RCOLS]
            z_validf = cm[260:261, :RCOLS]
            lbf = (pk[:, 9:10], pk[:, 10:11], pk[:, 11:12])
            xa1 = oa + a_colf
            xb1 = ob + b_colf
            xz1 = oz + zcolf
            Wz = onehot(wvals[2], lbf[2], zcolf, z_validf)
            Dz = onehot(dvals[2], lbf[2], zcolf, z_validf)
        else:
            col = jax.lax.broadcasted_iota(jnp.int32, (CHUNK, r2pad), 1)
            a_col = jnp.minimum(col // region, region - 1)
            b_col = col % region
            col_valid = (col < r2).astype(jnp.float32)
            zcol = jax.lax.broadcasted_iota(jnp.int32, (CHUNK, RCOLS), 1)
            z_valid = (zcol < region).astype(jnp.float32)
            lvals = pk[:, 9:12].astype(jnp.int32)
            # cell-unit coordinates (G2P frame; P2G scales by dx)
            xa1 = oa + a_col.astype(jnp.float32)
            xb1 = ob + b_col.astype(jnp.float32)
            xz1 = oz + zcol.astype(jnp.float32)
            Wz = onehot(wvals[2], lvals[:, 2:3], zcol, z_valid)
            Dz = onehot(dvals[2], lvals[:, 2:3], zcol, z_valid)
        lhs = jnp.concatenate([Wz, Wz * xz1, Dz, Dz * xz1], axis=0)

        # ONE stacked z-contraction for all 7 channel regions (4 compact
        # + 3 velocity) x all 4 stencils: channels separated by zero rows
        # up to r2pad so the (4*CHUNK, 7*r2pad) result slices at
        # tile-aligned offsets, and the padded columns are exact zeros
        # (replaces 7 dots + 7 output pads; kernel-internal op count is
        # a first-class cost on this target, RESULTS.md r3).
        zrows = jnp.zeros((r2pad - r2, RCOLS), jnp.float32)
        parts = []
        for q in range(4):
            parts += [compact_ref[0, q], zrows]
        for q in range(3):
            parts += [vreg_ref[0, q], zrows]
        rr = jnp.concatenate(parts, axis=0)  # (7*r2pad, RCOLS)
        zc_all = _acc_dot(lhs, rr, (((1,), (1,)), ((), ())))

        def pick(qi):
            return tuple(
                zc_all[v * CHUNK:(v + 1) * CHUNK,
                       qi * r2pad:(qi + 1) * r2pad]
                for v in range(4)
            )

        P = [pick(q) for q in range(4)]
        Gv = [pick(4 + q) for q in range(3)]

        if use_mxu:
            cm = rest[0][...]
            jcol = jax.lax.broadcasted_iota(jnp.int32, (CHUNK, 128), 1)
            Mx, My = cm[0:128], cm[128:256]
            Wx = mm_ew(make_ew(jcol, wvals[0], lbf[0]), Mx)
            Wy = mm_ew(make_ew(jcol, wvals[1], lbf[1]), My)
            Dx = mm_ew(make_ew(jcol, dvals[0], lbf[0]), Mx)
            Dy = mm_ew(make_ew(jcol, dvals[1], lbf[1]), My)
        else:
            Wx = onehot(wvals[0], lvals[:, 0:1], a_col, col_valid)
            Wy = onehot(wvals[1], lvals[:, 1:2], b_col, col_valid)
            Dx = onehot(dvals[0], lvals[:, 0:1], a_col, col_valid)
            Dy = onehot(dvals[1], lvals[:, 1:2], b_col, col_valid)
        T = Wx * Wy

        # ---- P2G d_feats13 (world-scale coordinates)
        rows = [jnp.sum(T * P[q][0], axis=1) for q in range(3)]
        Ta = T * (xa1 * scale_p)
        Tb = T * (xb1 * scale_p)
        for q in range(3):
            rows += [jnp.sum(Ta * P[q][0], axis=1),
                     jnp.sum(Tb * P[q][0], axis=1),
                     scale_p * jnp.sum(T * P[q][1], axis=1)]
        rows.append(jnp.sum(T * P[3][0], axis=1))

        # ---- shared d_fx: sum the two sides' feats-contracted profiles
        def prof(Z, ZX, c0, c, scale, mass=None, Zm=None):
            P0 = jnp.zeros((CHUNK, r2pad), jnp.float32)
            Pa = jnp.zeros((CHUNK, r2pad), jnp.float32)
            Pb = jnp.zeros((CHUNK, r2pad), jnp.float32)
            for q in range(3):
                P0 = P0 + c0[:, q:q + 1] * Z[q]
                P0 = P0 + (scale * c[:, 3 * q + 2:3 * q + 3]) * ZX[q]
                Pa = Pa + c[:, 3 * q:3 * q + 1] * Z[q]
                Pb = Pb + c[:, 3 * q + 1:3 * q + 2] * Z[q]
            if mass is not None:
                P0 = P0 + mass * Zm
            return P0 + (scale * xa1) * Pa + (scale * xb1) * Pb

        FZ = prof([P[q][0] for q in range(3)], [P[q][1] for q in range(3)],
                  f13[:, 0:3], f13[:, 3:12], scale_p,
                  mass=f13[:, 12:13], Zm=P[3][0])
        FZ = FZ + prof([Gv[q][0] for q in range(3)],
                       [Gv[q][1] for q in range(3)],
                       f12[:, 0:3], f12[:, 3:12], 1.0)
        FD = prof([P[q][2] for q in range(3)], [P[q][3] for q in range(3)],
                  f13[:, 0:3], f13[:, 3:12], scale_p,
                  mass=f13[:, 12:13], Zm=P[3][2])
        FD = FD + prof([Gv[q][2] for q in range(3)],
                       [Gv[q][3] for q in range(3)],
                       f12[:, 0:3], f12[:, 3:12], 1.0)
        rows += [
            jnp.sum(Dx * Wy * FZ, axis=1),
            jnp.sum(Wx * Dy * FZ, axis=1),
            jnp.sum(T * FD, axis=1),
        ]

        out = jnp.stack(rows, axis=1)  # (CHUNK, 16)
        out_ref[...] = jnp.pad(out, ((0, 0), (0, OUTB - 16)))

    def run(packed, compact, vregions, c2b, n_pad: int, active=None):
        nch = packed.shape[0] // CHUNK
        if active is None:
            active = jnp.ones((nch,), jnp.int32)
        in_specs = [
            pl.BlockSpec((CHUNK, PACKB), lambda i, c2b, act: (i, 0)),
            pl.BlockSpec(
                (1, 4, r2, RCOLS), lambda i, c2b, act: (c2b[i], 0, 0, 0)
            ),
            pl.BlockSpec(
                (1, 3, r2, RCOLS), lambda i, c2b, act: (c2b[i], 0, 0, 0)
            ),
        ]
        args = [c2b, active, packed, compact, vregions]
        if use_mxu:
            cm = jnp.asarray(_consts_np(m))
            in_specs.append(
                pl.BlockSpec(cm.shape, lambda i, c2b, act: (0, 0))
            )
            args.append(cm)
        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=2,
            grid=(nch,),
            in_specs=in_specs,
            out_specs=pl.BlockSpec(
                (CHUNK, OUTB), lambda i, c2b, act: (i, 0)
            ),
        )
        return pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct((n_pad, OUTB), jnp.float32),
            grid_spec=grid_spec,
        )(*args)

    return run


@functools.lru_cache(maxsize=None)
def _make_bwd_kernel_merged_t(m: int, nb: int, scale_p: float, cpad: int):
    """Column-oriented twin of ``_make_bwd_kernel_merged``
    (FL_KORIENT=cols): reads the (R, NPAD) sorted SoA buffer as column
    blocks (row layout [w(9) lb(3) f12(12) pad wp(9) f13(13)]), builds
    ab masks at 328 sublanes instead of 384 lanes, and emits (16, NPAD)
    SoA rows [d_feats13(13) | d_fx(3)] — no pack/unpack transposes."""
    from fluidlab_tpu.ops.p2g_pallas import _r2s as _r2s_fn
    from fluidlab_tpu.ops.regions_pallas import _onehot_w_t

    region = _region(m)
    r2 = region * region
    r2s = _r2s_fn(m)
    OWP = 12 + cpad
    OF13 = 21 + cpad
    OUTR = 16

    def kernel(c2b_ref, act_ref, packed_ref, compact_ref, vreg_ref,
               out_ref):
        i = pl.program_id(0)

        @pl.when(act_ref[i] == 0)
        def _():
            out_ref[...] = jnp.zeros_like(out_ref)

        @pl.when(act_ref[i] != 0)
        def _():
            _mbody(c2b_ref, packed_ref, compact_ref, vreg_ref, out_ref)

    def _mbody(c2b_ref, packed_ref, compact_ref, vreg_ref, out_ref):
        i = pl.program_id(0)
        b = c2b_ref[i]
        bj = (b // nb) % nb
        bk = b % nb
        oa = ((b // (nb * nb)) * BLOCK - m).astype(jnp.float32)
        ob = (bj * BLOCK - m).astype(jnp.float32)
        oz = (bk * BLOCK - m).astype(jnp.float32)

        pk = packed_ref[...]  # (R, CHUNK)
        lbi = pk[9:12].astype(jnp.int32)
        f12 = pk[12:24]             # (12, CHUNK) [S0bar(3) | S1bar(9)]
        f13 = pk[OF13:OF13 + 13]    # (13, CHUNK) [b(3) | affine(9) | m]

        zrow = jax.lax.broadcasted_iota(jnp.int32, (RCOLS, 1), 0)
        zv = (zrow < region).astype(jnp.float32)
        xz1 = oz + zrow.astype(jnp.float32)  # (RCOLS, 1), cell units
        Wz = _onehot_w_t(pk[6:9], lbi[2:3], zrow) * zv
        Dz = _onehot_w_t(pk[OWP + 6:OWP + 9], lbi[2:3], zrow) * zv
        lhs = jnp.concatenate(
            [Wz, Wz * xz1, Dz, Dz * xz1], axis=1
        )  # (RCOLS, 4*CHUNK)

        # ONE stacked z-contraction for all 7 channel regions (4
        # compact + 3 velocity) x all 4 stencils: channels row-stacked
        # with zero rows up to r2s so slices stay tile-aligned
        zrows = jnp.zeros((r2s - r2, RCOLS), jnp.float32)
        parts = []
        for q in range(4):
            parts += [compact_ref[0, q], zrows]
        for q in range(3):
            parts += [vreg_ref[0, q], zrows]
        rr = jnp.concatenate(parts, axis=0)  # (7*r2s, RCOLS)
        zc_all = _acc_dot(rr, lhs, (((1,), (0,)), ((), ())))
        # (7*r2s, 4*CHUNK)

        def pick(qi):
            return tuple(
                zc_all[qi * r2s:(qi + 1) * r2s,
                       v * CHUNK:(v + 1) * CHUNK]
                for v in range(4)
            )

        P = [pick(q) for q in range(4)]
        Gv = [pick(4 + q) for q in range(3)]

        row = jax.lax.broadcasted_iota(jnp.int32, (r2s, 1), 0)
        a_row = jnp.minimum(row // region, region - 1)
        b_row = row % region
        rv = (row < r2).astype(jnp.float32)
        xa1 = oa + a_row.astype(jnp.float32)  # (r2s, 1), cell units
        xb1 = ob + b_row.astype(jnp.float32)
        Wx = _onehot_w_t(pk[0:3], lbi[0:1], a_row) * rv
        Wy = _onehot_w_t(pk[3:6], lbi[1:2], b_row) * rv
        Dx = _onehot_w_t(pk[OWP:OWP + 3], lbi[0:1], a_row) * rv
        Dy = _onehot_w_t(pk[OWP + 3:OWP + 6], lbi[1:2], b_row) * rv
        T = Wx * Wy

        # ---- P2G d_feats13 (world-scale coordinates)
        rows = [jnp.sum(T * P[q][0], axis=0) for q in range(3)]
        Ta = T * (xa1 * scale_p)
        Tb = T * (xb1 * scale_p)
        for q in range(3):
            rows += [jnp.sum(Ta * P[q][0], axis=0),
                     jnp.sum(Tb * P[q][0], axis=0),
                     scale_p * jnp.sum(T * P[q][1], axis=0)]
        rows.append(jnp.sum(T * P[3][0], axis=0))

        # ---- shared d_fx: sum the two sides' feats-contracted profiles
        def prof(Z, ZX, c0, c, scale, mass=None, Zm=None):
            P0 = jnp.zeros((r2s, CHUNK), jnp.float32)
            Pa = jnp.zeros((r2s, CHUNK), jnp.float32)
            Pb = jnp.zeros((r2s, CHUNK), jnp.float32)
            for q in range(3):
                P0 = P0 + c0[q:q + 1, :] * Z[q]
                P0 = P0 + (scale * c[3 * q + 2:3 * q + 3, :]) * ZX[q]
                Pa = Pa + c[3 * q:3 * q + 1, :] * Z[q]
                Pb = Pb + c[3 * q + 1:3 * q + 2, :] * Z[q]
            if mass is not None:
                P0 = P0 + mass * Zm
            return P0 + (scale * xa1) * Pa + (scale * xb1) * Pb

        FZ = prof([P[q][0] for q in range(3)], [P[q][1] for q in range(3)],
                  f13[0:3], f13[3:12], scale_p,
                  mass=f13[12:13], Zm=P[3][0])
        FZ = FZ + prof([Gv[q][0] for q in range(3)],
                       [Gv[q][1] for q in range(3)],
                       f12[0:3], f12[3:12], 1.0)
        FD = prof([P[q][2] for q in range(3)], [P[q][3] for q in range(3)],
                  f13[0:3], f13[3:12], scale_p,
                  mass=f13[12:13], Zm=P[3][2])
        FD = FD + prof([Gv[q][2] for q in range(3)],
                       [Gv[q][3] for q in range(3)],
                       f12[0:3], f12[3:12], 1.0)
        rows += [
            jnp.sum(Dx * Wy * FZ, axis=0),
            jnp.sum(Wx * Dy * FZ, axis=0),
            jnp.sum(T * FD, axis=0),
        ]

        out = jnp.stack(rows, axis=0)  # (16, CHUNK)
        out_ref[...] = out

    def run(packed, compact, vregions, c2b, n_pad: int, active=None):
        nch = packed.shape[-1] // CHUNK
        nr = packed.shape[0]
        if active is None:
            active = jnp.ones((nch,), jnp.int32)
        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=2,
            grid=(nch,),
            in_specs=[
                pl.BlockSpec((nr, CHUNK), lambda i, c2b, act: (0, i)),
                pl.BlockSpec(
                    (1, 4, r2, RCOLS), lambda i, c2b, act: (c2b[i], 0, 0, 0)
                ),
                pl.BlockSpec(
                    (1, 3, r2, RCOLS), lambda i, c2b, act: (c2b[i], 0, 0, 0)
                ),
            ],
            out_specs=pl.BlockSpec(
                (OUTR, CHUNK), lambda i, c2b, act: (0, i)
            ),
        )
        return pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct((OUTR, n_pad), jnp.float32),
            grid_spec=grid_spec,
        )(c2b, active, packed, compact, vregions)

    return run


def transfer_bwd_fx(fx, base, feats, regions, order, valid, inv, starts,
                    block, G: int, m: int, presorted: bool,
                    interpret: bool, nq: int, has_mass: bool,
                    need_dfeats: bool, scale: float):
    """(d_feats (C, N) or None, d_fx (3, N)) against compact-channel
    regions (NB^3, nqt, r2, RCOLS); see _make_bwd_kernel_v3."""
    from fluidlab_tpu.core.bspline import (
        quadratic_dweights_soa,
        quadratic_weights_soa,
    )

    C = feats.shape[0]
    N = fx.shape[-1]
    npad = N if presorted else order.shape[0]
    nb = G // BLOCK

    w = quadratic_weights_soa(fx)
    wp = quadratic_dweights_soa(fx)
    lb = (base - block * BLOCK + m).astype(jnp.float32)
    rows = jnp.concatenate(
        [w[:, 0], w[:, 1], w[:, 2], wp[:, 0], wp[:, 1], wp[:, 2],
         lb, feats], axis=0,
    )  # (21 + C, N)
    if not presorted:
        from fluidlab_tpu.ops.binning import pack_rows

        rows = pack_rows(rows, order, inv)
        vz = valid[None, :]
        rows = jnp.concatenate(
            [rows[:3] * vz, rows[3:9], rows[9:12] * vz, rows[12:]], axis=0
        )
    rows = jnp.pad(rows, ((0, PACKB - 21 - C), (0, 0)))
    if presorted:
        from fluidlab_tpu.ops.binning import pin_rowmajor

        rows = pin_rowmajor(rows)  # stop {0,1} carry-layout propagation
    packed = rows.T  # (NPAD, PACKB)
    c2b = chunk_to_block(starts, npad)

    fn = _make_bwd_kernel_v3(m, nq, has_mass, need_dfeats, scale, nb)
    if interpret:
        with pltpu.force_tpu_interpret_mode():
            out = fn(packed, regions, c2b, npad)
    else:
        out = fn(packed, regions, c2b, npad)

    res = out[:npad, :C + 3]
    if not presorted:
        from fluidlab_tpu.ops.binning import unpack_rows

        res = unpack_rows(res, order, valid, inv)
    res_t = res.T  # (C + 3, N)
    if presorted:
        from fluidlab_tpu.ops.binning import pin_rowmajor

        res_t = pin_rowmajor(res_t)
    d_feats = res_t[:C] if need_dfeats else None
    d_fx = res_t[C:C + 3]
    return d_feats, d_fx


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
    if presorted:
        from fluidlab_tpu.ops.binning import pin_rowmajor

        rows = pin_rowmajor(rows)
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
    if presorted:
        from fluidlab_tpu.ops.binning import pin_rowmajor

        res_t = pin_rowmajor(res_t)
    d_feats = res_t[:C]
    d_w = res_t[C:].reshape(3, 3, -1).transpose(1, 0, 2)  # (off, ax, N)
    return d_feats, d_w
