"""Pallas block-binned G2P — gather-free grid-to-particle transfer.

TPU XLA gathers cost ~16 ms/substep at 65k particles whether issued as 27
separate (N,)-index gathers or one fused 27N gather (measured; see
RESULTS.md).  This kernel eliminates them: particles are binned by
16^3-cell block (ops/binning.py, shared with the P2G kernel), each
block's halo region is sliced out of the grid with *static* slices and
DMA'd to VMEM, and the per-particle interpolation becomes dense MXU
contractions over the local region:

    S0[p]      = sum_cells  wprod[p, cell] * g[cell]          (new_v)
    S1[p, :, d] = sum_cells wprod[p, cell] * g[cell] * cell_d  (APIC C)

with the cell-coordinate moments factored per axis (modified axis
weights W' = W * coord).  The APIC C then follows in XLA as
``C = 4 inv_dx (S1_global - S0 (x inv_dx))`` — all elementwise.

The halo margin ``m`` (see ops/p2g_pallas.py) admits binnings computed
from positions up to ``m`` cells stale, enabling once-per-control-step
binning with the particle state kept in sorted order across substeps.

The op is linear in the grid: the grid cotangent in the VJP is exactly a
P2G transfer of the output cotangents (values affine in the cell index),
computed with the fast Pallas P2G core; the weight cotangents come from
the moment-backward kernel (ops/transfer_bwd_pallas.py).  Fully
gather-free in both directions.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from fluidlab_tpu.ops.binning import (
    ALIGN,
    BLOCK,
    Binning,
    chunk_to_block,
    compute_binning,
)
from fluidlab_tpu.ops.p2g_pallas import HALO, _p2g_core, _region, _r2pad
from fluidlab_tpu.ops.masks import use_mxu as _use_mxu

CHUNK = ALIGN  # particles per grid step == binning alignment
PACKG = 128  # packed row: wx(3) wy(3) wz(3) lbase(3)
RCOLS = 128  # region z-extent padded to lanes (region <= 24 used)
OUTC = 128   # output row: S0(3) S1loc(9) padded


@functools.lru_cache(maxsize=None)
def _make_g2p_blocks(m: int, use_mxu: bool):
    from fluidlab_tpu.ops.masks import (
        _consts_np,
        make_ew,
        mm_ew,
    )

    region = _region(m)
    r2 = region * region
    r2pad = _r2pad(m)

    def kernel(c2b_ref, act_ref, packed_ref, regions_ref, *rest):
        del c2b_ref  # used only by the index maps
        out_ref = rest[-1]

        # all-dummy chunks (CSR padding): rows are discarded downstream
        # (valid mask / inert slots) but the out block must still be
        # written — zeros, skipping the mask builds and contractions
        i = pl.program_id(0)

        @pl.when(act_ref[i] == 0)
        def _():
            out_ref[...] = jnp.zeros_like(out_ref)

        @pl.when(act_ref[i] != 0)
        def _():
            _body(packed_ref, regions_ref, rest)

    def _body(packed_ref, regions_ref, rest):
        out_ref = rest[-1]
        rvals = regions_ref[0]  # (3, r2, RCOLS)

        pk = packed_ref[...]  # (CHUNK, PACKG)
        wvals = (pk[:, 0:3], pk[:, 3:6], pk[:, 6:9])

        def onehot(w_axis, lb, ids, valid):
            off = ids - lb
            out = jnp.zeros(ids.shape, jnp.float32)
            for o in range(3):
                out = out + jnp.where(off == o, w_axis[:, o:o + 1], 0.0)
            return out * valid

        if use_mxu:
            # MXU/constant-operand mask build (ops/masks.py): one
            # 128-lane EW compare + dot per xy axis; index lattices are
            # constant rows of the revisited consts block.
            cm = rest[0][...]
            lbf = (pk[:, 9:10], pk[:, 10:11], pk[:, 11:12])
            jcol = jax.lax.broadcasted_iota(jnp.int32, (CHUNK, 128), 1)
            Wx = mm_ew(make_ew(jcol, wvals[0], lbf[0]), cm[0:128])
            Wy = mm_ew(make_ew(jcol, wvals[1], lbf[1]), cm[128:256])
            a_colf = cm[256:257]
            b_colf = cm[257:258]
            zcolf = cm[259:260, :RCOLS]
            z_validf = cm[260:261, :RCOLS]
            Wz = onehot(wvals[2], lbf[2], zcolf, z_validf)
            Wz_c = Wz * zcolf
            T = Wx * Wy
            T_a = T * a_colf
            T_b = T * b_colf
        else:
            col = jax.lax.broadcasted_iota(jnp.int32, (CHUNK, r2pad), 1)
            a_col = jnp.minimum(col // region, region - 1)
            b_col = col % region
            col_valid = (col < r2).astype(jnp.float32)
            zcol = jax.lax.broadcasted_iota(jnp.int32, (CHUNK, RCOLS), 1)
            z_valid = (zcol < region).astype(jnp.float32)
            lvals = pk[:, 9:12].astype(jnp.int32)
            Wz = onehot(wvals[2], lvals[:, 2:3], zcol, z_valid)
            Wz_c = Wz * zcol.astype(jnp.float32)
            Wx = onehot(wvals[0], lvals[:, 0:1], a_col, col_valid)
            Wy = onehot(wvals[1], lvals[:, 1:2], b_col, col_valid)
            T = Wx * Wy
            T_a = T * a_col.astype(jnp.float32)
            T_b = T * b_col.astype(jnp.float32)

        # ONE stacked z-contraction for all channels and both stencils:
        # lhs [Wz | Wz*z] (2*CHUNK, RCOLS) against the channel-stacked
        # region rows (channels separated by zero rows up to r2pad so
        # the result slices at tile-aligned r2pad offsets).  Replaces 6
        # dots + 6 output pads — kernel-internal op count is a
        # first-class cost on this target (RESULTS.md r3).
        from fluidlab_tpu.ops.masks import acc_dot

        zrows = jnp.zeros((r2pad - r2, RCOLS), jnp.float32)
        rr = jnp.concatenate(
            [rvals[0], zrows, rvals[1], zrows, rvals[2], zrows], axis=0
        )  # (3*r2pad, RCOLS)
        lhs2 = jnp.concatenate([Wz, Wz_c], axis=0)  # (2*CHUNK, RCOLS)
        zc = acc_dot(lhs2, rr, (((1,), (1,)), ((), ())))  # (2*CHUNK, 3*r2pad)

        outs = []
        for ch in range(3):
            gz_p = zc[0:CHUNK, ch * r2pad:(ch + 1) * r2pad]
            gzc_p = zc[CHUNK:2 * CHUNK, ch * r2pad:(ch + 1) * r2pad]
            s0 = jnp.sum(T * gz_p, axis=1)       # (CHUNK,)
            s1a = jnp.sum(T_a * gz_p, axis=1)    # x-moment
            s1b = jnp.sum(T_b * gz_p, axis=1)    # y-moment
            s1c = jnp.sum(T * gzc_p, axis=1)     # z-moment
            outs += [s0, s1a, s1b, s1c]

        # rows: [S0_x S0_y S0_z | S1 row-major (g_i x local_d)]
        # outs layout per channel i: [s0_i, s1_ix, s1_iy, s1_iz]
        packed_out = jnp.stack(
            [outs[0], outs[4], outs[8],        # S0
             outs[1], outs[2], outs[3],        # S1[0, :]
             outs[5], outs[6], outs[7],        # S1[1, :]
             outs[9], outs[10], outs[11]],     # S1[2, :]
            axis=1,
        )  # (CHUNK, 12)
        out_ref[...] = jnp.pad(packed_out, ((0, 0), (0, OUTC - 12)))

    def g2p_blocks(packed, regions, c2b, nb: int, n_pad: int, active=None):
        nch = packed.shape[0] // CHUNK
        if active is None:
            active = jnp.ones((nch,), jnp.int32)
        in_specs = [
            pl.BlockSpec((CHUNK, PACKG), lambda i, c2b, act: (i, 0)),
            pl.BlockSpec(
                (1, 3, r2, RCOLS), lambda i, c2b, act: (c2b[i], 0, 0, 0)
            ),
        ]
        args = [c2b, active, packed, regions]
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
                (CHUNK, OUTC), lambda i, c2b, act: (i, 0)
            ),
        )
        return pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct((n_pad, OUTC), jnp.float32),
            grid_spec=grid_spec,
        )(*args)

    return g2p_blocks


@functools.lru_cache(maxsize=None)
def _make_g2p_blocks_t(m: int):
    """Column-oriented twin of ``_make_g2p_blocks`` (FL_KORIENT=cols):
    reads the (R, NPAD) sorted SoA buffer as column blocks (rows 0:12 =
    w9 + lb), emits (16, NPAD) SoA rows [S0(3) | S1loc(9) | pad] — no
    pack/unpack transposes, ab at 328 sublanes instead of 384 lanes."""
    from fluidlab_tpu.ops.masks import acc_dot
    from fluidlab_tpu.ops.p2g_pallas import _r2s as _r2s_fn
    from fluidlab_tpu.ops.regions_pallas import _onehot_w_t

    region = _region(m)
    r2 = region * region
    r2s = _r2s_fn(m)
    OUTR = 16

    def kernel(c2b_ref, act_ref, packed_ref, regions_ref, out_ref):
        del c2b_ref
        i = pl.program_id(0)

        @pl.when(act_ref[i] == 0)
        def _():
            out_ref[...] = jnp.zeros_like(out_ref)

        @pl.when(act_ref[i] != 0)
        def _():
            _body(packed_ref, regions_ref, out_ref)

    def _body(packed_ref, regions_ref, out_ref):
        rvals = regions_ref[0]  # (3, r2, RCOLS)
        pk = packed_ref[...]    # (R, CHUNK)
        lbi = pk[9:12].astype(jnp.int32)

        zrow = jax.lax.broadcasted_iota(jnp.int32, (RCOLS, 1), 0)
        zv = (zrow < region).astype(jnp.float32)
        Wz = _onehot_w_t(pk[6:9], lbi[2:3], zrow) * zv  # (RCOLS, CHUNK)
        Wz_c = Wz * zrow.astype(jnp.float32)

        # stacked z-contraction: channel-stacked regions (zero rows up
        # to r2s keep the row slices tile-aligned) against [Wz | Wz*z]
        zrows = jnp.zeros((r2s - r2, RCOLS), jnp.float32)
        rr = jnp.concatenate(
            [rvals[0], zrows, rvals[1], zrows, rvals[2], zrows], axis=0
        )  # (3*r2s, RCOLS)
        lhs = jnp.concatenate([Wz, Wz_c], axis=1)  # (RCOLS, 2*CHUNK)
        zc = acc_dot(rr, lhs, (((1,), (0,)), ((), ())))  # (3*r2s, 2*CHUNK)

        row = jax.lax.broadcasted_iota(jnp.int32, (r2s, 1), 0)
        a_row = jnp.minimum(row // region, region - 1)
        b_row = row % region
        rv = (row < r2).astype(jnp.float32)
        T = (
            _onehot_w_t(pk[0:3], lbi[0:1], a_row)
            * _onehot_w_t(pk[3:6], lbi[1:2], b_row)
            * rv
        )  # (r2s, CHUNK)
        T_a = T * a_row.astype(jnp.float32)
        T_b = T * b_row.astype(jnp.float32)

        outs = []
        for ch in range(3):
            gz = zc[ch * r2s:(ch + 1) * r2s, 0:CHUNK]
            gzc = zc[ch * r2s:(ch + 1) * r2s, CHUNK:2 * CHUNK]
            outs += [
                jnp.sum(T * gz, axis=0),     # s0
                jnp.sum(T_a * gz, axis=0),   # x-moment
                jnp.sum(T_b * gz, axis=0),   # y-moment
                jnp.sum(T * gzc, axis=0),    # z-moment
            ]

        # rows: [S0_x S0_y S0_z | S1 row-major (g_i x local_d)]
        packed_out = jnp.stack(
            [outs[0], outs[4], outs[8],
             outs[1], outs[2], outs[3],
             outs[5], outs[6], outs[7],
             outs[9], outs[10], outs[11]],
            axis=0,
        )  # (12, CHUNK)
        out_ref[...] = jnp.pad(packed_out, ((0, OUTR - 12), (0, 0)))

    def g2p_blocks(packed, regions, c2b, nb: int, n_pad: int, active=None):
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
        )(c2b, active, packed, regions)

    return g2p_blocks


def _build_regions(v_out, G: int, nb: int, m: int = 0):
    """(C, G^3) grid -> (NB^3, C, r2, RCOLS) overlapping halo regions via
    static slices (no gathers).  Region of block b covers global cells
    [b*BLOCK - m, b*BLOCK - m + region)."""
    region = _region(m)
    hx = region - BLOCK  # hi-side overlap pulled from the next block
    v4 = v_out.reshape(v_out.shape[0], G, G, G)
    v4p = jnp.pad(v4, ((0, 0), (m, BLOCK), (m, BLOCK), (m, BLOCK)))

    def split_axis(arr, axis):
        # (..., G+m+pad, ...) -> (..., NB, region, ...) with overlap
        core = jax.lax.slice_in_dim(arr, 0, G + m, axis=axis)
        core = jax.lax.slice_in_dim(core, 0, nb * BLOCK, axis=axis)
        halo_src = jax.lax.slice_in_dim(
            arr, BLOCK, BLOCK + nb * BLOCK, axis=axis
        )
        new_shape = arr.shape[:axis] + (nb, BLOCK) + arr.shape[axis + 1:]
        core = core.reshape(new_shape)
        halo = halo_src.reshape(new_shape)
        halo = jax.lax.slice_in_dim(halo, 0, hx, axis=axis + 1)
        return jnp.concatenate([core, halo], axis=axis + 1)

    r = split_axis(v4p, 1)      # (3, NB, R, G+p, G+p)
    r = split_axis(r, 3)        # (3, NB, R, NB, R, G+p)
    r = split_axis(r, 5)        # (3, NB, R, NB, R, NB, R)
    r = r.transpose(1, 3, 5, 0, 2, 4, 6).reshape(
        nb * nb * nb, v_out.shape[0], region * region, region
    )
    return jnp.pad(r, ((0, 0), (0, 0), (0, 0), (0, RCOLS - region)))


@functools.partial(jax.custom_vjp, nondiff_argnums=(8, 9, 10, 11))
def _g2p_core(w, base, v_out, order, valid, inv, starts, block,
              G: int, m: int, presorted: bool, interpret: bool):
    """(S0 (3, N), S1_global (9, N)): zeroth and first cell-index moments
    of the stencil-weighted grid values."""
    return _g2p_core_fwd(
        w, base, v_out, order, valid, inv, starts, block, G, m, presorted,
        interpret,
    )[0]


def _g2p_core_impl(w, base, v_out, order, valid, inv, starts, block,
                   G, m, presorted, interpret):
    N = w.shape[-1]
    npad = N if presorted else order.shape[0]
    nb = G // BLOCK

    lb = (base - block * BLOCK + m).astype(jnp.float32)
    rows = jnp.concatenate([w[:, 0], w[:, 1], w[:, 2], lb], axis=0)
    if not presorted:
        from fluidlab_tpu.ops.binning import pack_rows

        rows = pack_rows(rows, order, inv)  # (12, NPAD); dummies unread
    rows = jnp.pad(rows, ((0, PACKG - 12), (0, 0)))
    if presorted:
        from fluidlab_tpu.ops.binning import pin_rowmajor

        rows = pin_rowmajor(rows)  # stop {0,1} carry-layout propagation
    packed = rows.T  # (NPAD, PACKG)
    c2b = chunk_to_block(starts, npad)

    regions = _build_regions(v_out, G, nb, m)

    fn = _make_g2p_blocks(m, _use_mxu())
    if interpret:
        with pltpu.force_tpu_interpret_mode():
            out = fn(packed, regions, c2b, nb, npad)
    else:
        out = fn(packed, regions, c2b, nb, npad)

    res = out[:npad, :12]  # slice BEFORE the unsort (12 vs 128 cols)
    if not presorted:
        from fluidlab_tpu.ops.binning import unpack_rows

        res = unpack_rows(res, order, valid, inv)  # particle order
    res_t = res.T  # (12, N)
    if presorted:
        from fluidlab_tpu.ops.binning import pin_rowmajor

        res_t = pin_rowmajor(res_t)
    S0 = res_t[:3]
    S1loc = res_t[3:12]
    # local -> global cell coordinates: S1g[i, d] = S1loc + borig_d * S0_i
    borig = (block * BLOCK - m).astype(jnp.float32)  # (3, N)
    S1g = jnp.stack([
        S1loc[3 * i + d] + borig[d] * S0[i]
        for i in range(3) for d in range(3)
    ])
    return S0, S1g


def _g2p_core_fwd(w, base, v_out, order, valid, inv, starts, block,
                  G, m, presorted, interpret):
    out = _g2p_core_impl(
        w, base, v_out, order, valid, inv, starts, block, G, m, presorted,
        interpret,
    )
    return out, (w, base, v_out, order, valid, inv, starts, block)


def _g2p_core_bwd(G, m, presorted, interpret, res, cots):
    w, base, v_out, order, valid, inv, starts, block = res
    S0bar, S1bar = cots  # (3, N), (9, N)

    # d_v_out: scatter of values affine in the cell index:
    #   val_i(cell) = wprod (S0bar_i + sum_d S1bar[i,d] cell_d)
    # -> the P2G core accumulates feats13 = [b | A | m] and its combine is
    #    mom = b + A (cell dx); feed A' = S1bar / dx to cancel the dx.
    feats = jnp.concatenate(
        [S0bar, S1bar, jnp.zeros((1, S0bar.shape[-1]), S0bar.dtype)], axis=0
    )
    grid13 = _p2g_core(
        w, base, feats, order, valid, inv, starts, block, G, m, presorted,
        interpret,
    )  # (13, G^3)
    ii = jax.lax.broadcasted_iota(jnp.int32, (G, G, G), 0).reshape(-1)
    jj = jax.lax.broadcasted_iota(jnp.int32, (G, G, G), 1).reshape(-1)
    kk = jax.lax.broadcasted_iota(jnp.int32, (G, G, G), 2).reshape(-1)
    cell = [ii.astype(jnp.float32), jj.astype(jnp.float32),
            kk.astype(jnp.float32)]
    d_v = jnp.stack([
        grid13[i] + sum(grid13[3 + 3 * i + d] * cell[d] for d in range(3))
        for i in range(3)
    ])

    # d_w via the gather-free moment-backward kernel: the cotangent
    # contracts as e(cell) = sum_i g_i (S0bar_i + sum_d S1bar_id cell_d)
    # = sum_c feats12[c] grids12[c, cell] with grids12 = [g | g x cell_d]
    from fluidlab_tpu.ops.transfer_bwd_pallas import transfer_bwd

    grids12 = jnp.concatenate([
        v_out,
        jnp.concatenate([
            v_out[i][None, :] * cell[d][None, :]
            for i in range(3) for d in range(3)
        ], axis=0),
    ], axis=0)  # (12, G^3)
    feats12 = jnp.concatenate([S0bar, S1bar], axis=0)
    _, d_w = transfer_bwd(
        w, base, feats12, grids12, order, valid, inv, starts, block,
        G, m, presorted, interpret,
    )
    return d_w, None, d_v, None, None, None, None, None


_g2p_core.defvjp(_g2p_core_fwd, _g2p_core_bwd)


def g2p_pallas(base, fx, w, v_out, G, inv_dx, interpret=False,
               binning: Binning | None = None, m: int = 0,
               presorted: bool = False):
    """Gather-free G2P: returns (new_v (3, N), new_C (9, N)) matching the
    27-point stencil gather (reference mpm_simulator.py:400-426)."""
    if binning is None:
        binning = compute_binning(base, G)
    S0, S1g = _g2p_core(
        w, base, v_out, binning.order, binning.valid, binning.inv,
        binning.starts, binning.block, G, m, presorted, interpret,
    )
    xg = base.astype(S0.dtype) + fx  # x * inv_dx, cell units
    new_C = (4.0 * inv_dx) * jnp.stack([
        S1g[3 * i + d] - S0[i] * xg[d] for i in range(3) for d in range(3)
    ])
    return S0, new_C
