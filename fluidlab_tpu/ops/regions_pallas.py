"""Region-space grid phase: the canonical (C, G^3) grid never exists.

Round-1 profiling (RESULTS.md) showed the Pallas transfer kernels cost
only ~2.7 ms/substep combined while ~10 ms went to XLA glue around
them: the overlap-add of P2G halo regions into the canonical grid (a
chain of (13, 96^3) dynamic-update-slices), the channel-major
transposes, and the G2P region re-build — all plagued by minor-dim-16
intermediates that tile to (8, 128) with 8x lane padding.

This module keeps the whole grid phase in block-region space instead:

    p2g accumulate (+ affine combine epilogue)     [pallas]
      -> (NB^3, r2pad, 128)  cols z*4+q, q in {mom_xyz, mass}
    sweep_yz: halo-merge along y/z (9 neighbors)   [pallas]
    sweep_x_select: merge along x + per-channel    [pallas]
      unpack -> (NB^3, 4, r2, 128) fully-summed grid regions
    grid_op (XLA, pointwise on regions, redundant in halos)
    g2p consumes the (NB^3, 3, r2, 128) velocity regions directly

Cell values in overlapping halo cells are computed redundantly
(5832/4096 = 1.42x at m=0) — redundancy is free next to the relayouts
it replaces.  The merge is a linear broadcast, so its transpose (used
by the P2G VJP) sums region cotangents back: ``unsweep_x`` /
``unsweep_yz_expand`` mirror the forward sweeps with opposite shifts
and emit the accumulator cotangent directly in the moment-backward
kernel's flat layout (ops/transfer_bwd_pallas.py).

All shifts are ``pltpu.roll`` + iota masks: region rows are ab-major
(ab = a*R + b) so an x-block shift is a row roll by 16R, a y-shift a
row roll by 16 (cross-a bleed masked), and a z-shift a lane roll by
16*4 in the interleaved columns.

Reference: this replaces the grid assembly implied by the reference's
global Taichi grid (reference mpm_simulator.py:380-426); the physics is
identical, only the storage schedule differs.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from fluidlab_tpu.ops.binning import (ALIGN, BLOCK, chunk_active,
                                      chunk_to_block)
from fluidlab_tpu.ops.p2g_pallas import CPAD, PACK, _r2pad, _region
from fluidlab_tpu.ops.masks import use_mxu as _use_mxu

CHUNK = ALIGN
CQ = 4       # interleaved channels per z: mom_x, mom_y, mom_z, mass
QCOLS = 128  # interleaved column count (z*CQ + q; z < region <= 24 used)
RCOLS = 128  # per-channel z extent padding (matches ops/g2p_pallas.py)


# ---------------------------------------------------------------- helpers

def _onehot_w(w_axis, lb, ids):
    """W[p, col] = w_axis[p, ids[col] - lb[p]] for offsets 0..2."""
    off = ids - lb
    out = jnp.zeros(ids.shape, jnp.float32)
    for o in range(3):
        out = out + jnp.where(off == o, w_axis[:, o:o + 1], 0.0)
    return out


def _combine_mats(region, r2pad, wcols, n_mom, has_mass, oz, scale):
    """Selection matrices for the affine combine, built in-kernel.

    Input cols: z*CPAD + c with plain channels c=q (q < n_mom), affine
    channels c = 3 + 3q + d, mass at c = 12.  Output cols: z*CQ + q.
    Returns (S0, Sa, Sb, Szs): out = acc@S0 + xa*(acc@Sa) + xb*(acc@Sb)
    + acc@Szs, with the z coordinate folded into Szs.
    """
    cin = jax.lax.broadcasted_iota(jnp.int32, (wcols, QCOLS), 0)
    cout = jax.lax.broadcasted_iota(jnp.int32, (wcols, QCOLS), 1)
    z_src = cin // CPAD
    c_src = cin % CPAD
    z_out = cout // CQ
    q_out = cout % CQ
    zmatch = (z_src == z_out) & (z_src < region)
    is_mom = q_out < n_mom
    S0 = zmatch & ((is_mom & (c_src == q_out))
                   | (has_mass & (q_out == 3) & (c_src == 12)))
    Sa = zmatch & is_mom & (c_src == 3 + 3 * q_out + 0)
    Sb = zmatch & is_mom & (c_src == 3 + 3 * q_out + 1)
    Sz = zmatch & is_mom & (c_src == 3 + 3 * q_out + 2)
    xz = (oz + z_out.astype(jnp.float32)) * scale
    return (S0.astype(jnp.float32), Sa.astype(jnp.float32),
            Sb.astype(jnp.float32), Sz.astype(jnp.float32) * xz)


def _row_coords(region, r2pad, scale, oa, ob):
    """Per-row x/y coordinates (r2pad, 1) for ab = a*R + b rows."""
    row = jax.lax.broadcasted_iota(jnp.int32, (r2pad, 1), 0)
    a = row // region
    b = row % region
    xa = (oa + a.astype(jnp.float32)) * scale
    xb = (ob + b.astype(jnp.float32)) * scale
    return xa, xb


def _mm(a, b):
    from fluidlab_tpu.ops.masks import acc_dot

    return acc_dot(a, b, (((1,), (0,)), ((), ())))


def _mm_t(a, b):
    """a @ b.T contracted on last dims."""
    from fluidlab_tpu.ops.masks import acc_dot

    return acc_dot(a, b, (((1,), (1,)), ((), ())))


# -------------------------------------------------- accumulate (+ combine)

@functools.lru_cache(maxsize=None)
def _make_accumulate_regions(m: int, nb: int, n_mom: int, has_mass: bool,
                             scale: float, select_out: bool,
                             use_mxu: bool, grad: bool = False):
    """Chunk-grid P2G accumulate kernel (ops/p2g_pallas.py structure)
    whose epilogue applies the per-cell affine combine:

        out_q(cell) = plain_q + sum_d x_d(cell) * aff_{q,d}   (q < n_mom)
        out_3(cell) = mass                                    (has_mass)

    ``select_out=False`` emits interleaved (1, r2pad, QCOLS) blocks
    (z*CQ+q cols) feeding the halo sweeps; ``select_out=True`` emits
    per-channel (1, n_out, r2, RCOLS) blocks directly (used for the G2P
    VJP's d_vregions, which needs no neighbor merge).
    """
    from fluidlab_tpu.ops.masks import (
        _consts_np,
        _consts_wcols_np,
        make_ew,
        mm_ew,
    )

    region = _region(m)
    r2 = region * region
    r2pad = _r2pad(m)
    wcols = region * CPAD
    n_out = n_mom + (1 if has_mass else 0)

    from fluidlab_tpu.ops.masks import acc_dot as _adot
    from fluidlab_tpu.ops.masks import grad_dot_mode as _gmode

    def _adotk(a, b, dims):
        # grad builders (d_vregions) run their dots at FL_GRAD_DOT
        return _adot(a, b, dims, mode=_gmode() if grad else None)

    def _mmk(a, b):
        return _adotk(a, b, (((1,), (0,)), ((), ())))

    def kernel(c2b_ref, act_ref, packed_ref, *rest):
        out_ref, acc_ref = rest[-2], rest[-1]
        i = pl.program_id(0)
        nch = pl.num_programs(0)
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

        # all-dummy chunks (aligned-CSR padding + the static tail past
        # starts[-1], ~6-11% of chunk rows at 65k) contribute exact
        # zeros — skip their mask builds and dots entirely
        @pl.when(act_ref[i] != 0)
        def _():
            pk = packed_ref[...]  # (CHUNK, PACK)
            wvals = (pk[:, 0:3], pk[:, 3:6], pk[:, 6:9])
            fvals = pk[:, 12:12 + CPAD]

            if use_mxu:
                # MXU/constant-operand mask builds (ops/masks.py)
                cm = rest[0][...]
                mzw = rest[1][...]
                jcol = jax.lax.broadcasted_iota(jnp.int32, (CHUNK, 128), 1)
                T = (
                    mm_ew(make_ew(jcol, wvals[0], pk[:, 9:10]), cm[0:128])
                    * mm_ew(make_ew(jcol, wvals[1], pk[:, 10:11]), cm[128:256])
                )
                feats_tiled = _mmk(fvals, mzw[128:128 + CPAD])
                W2 = mm_ew(
                    make_ew(jcol, wvals[2], pk[:, 11:12]), mzw[0:128]
                ) * feats_tiled
            else:
                col = jax.lax.broadcasted_iota(jnp.int32, (CHUNK, r2pad), 1)
                a_col = jnp.minimum(col // region, region - 1)
                b_col = col % region
                col_valid = (col < r2).astype(jnp.float32)
                wcol = jax.lax.broadcasted_iota(jnp.int32, (CHUNK, wcols), 1)
                c_wcol = wcol // CPAD
                p_rows = jax.lax.broadcasted_iota(jnp.int32, (CPAD, wcols), 0)
                p_cols = jax.lax.broadcasted_iota(jnp.int32, (CPAD, wcols), 1)
                p_tile = (p_cols % CPAD == p_rows).astype(jnp.float32)
                lvals = pk[:, 9:12].astype(jnp.int32)
                T = (
                    _onehot_w(wvals[0], lvals[:, 0:1], a_col)
                    * _onehot_w(wvals[1], lvals[:, 1:2], b_col)
                    * col_valid
                )
                feats_tiled = _mmk(fvals, p_tile)
                W2 = _onehot_w(wvals[2], lvals[:, 2:3], c_wcol) * feats_tiled

            acc_ref[...] += _adotk(T, W2, (((0,), (0,)), ((), ())))

        @pl.when(last)
        def _():
            b = c2b_ref[i]
            bi = b // (nb * nb)
            bj = (b // nb) % nb
            bk = b % nb
            oa = (bi * BLOCK - m).astype(jnp.float32)
            ob = (bj * BLOCK - m).astype(jnp.float32)
            oz = (bk * BLOCK - m).astype(jnp.float32)
            acc = acc_ref[...]
            xa, xb = _row_coords(region, r2pad, scale, oa, ob)
            if not select_out:
                S0, Sa, Sb, Szs = _combine_mats(
                    region, r2pad, wcols, n_mom, has_mass, oz, scale
                )
                out_ref[0] = (
                    _mmk(acc, S0) + xa * _mmk(acc, Sa) + xb * _mmk(acc, Sb)
                    + _mmk(acc, Szs)
                )
            else:
                # ONE batched set of selection matmuls for all output
                # channels: q folded into the lane dim (q*RCOLS + z), so
                # 4 dots replace 4*n_out and the per-q writes slice at
                # tile-aligned offsets (kernel-internal op count is a
                # first-class cost on this target, RESULTS.md r3)
                ncols = n_out * RCOLS
                cin = jax.lax.broadcasted_iota(jnp.int32, (wcols, ncols), 0)
                cidx = jax.lax.broadcasted_iota(jnp.int32, (wcols, ncols), 1)
                qout = cidx // RCOLS
                zout = cidx % RCOLS
                z_src = cin // CPAD
                c_src = cin % CPAD
                zm = (z_src == zout) & (z_src < region)
                ismom = qout < n_mom
                S0 = zm & (
                    (ismom & (c_src == qout))
                    | (has_mass & (qout == n_mom) & (c_src == 12))
                )
                Sa = zm & ismom & (c_src == 3 + 3 * qout + 0)
                Sb = zm & ismom & (c_src == 3 + 3 * qout + 1)
                Sz = zm & ismom & (c_src == 3 + 3 * qout + 2)
                xz = (oz + zout.astype(jnp.float32)) * scale
                Oall = (
                    _mmk(acc, S0.astype(jnp.float32))
                    + xa * _mmk(acc, Sa.astype(jnp.float32))
                    + xb * _mmk(acc, Sb.astype(jnp.float32))
                    + _mmk(acc, Sz.astype(jnp.float32) * xz)
                )  # (r2pad, n_out*RCOLS)
                for q in range(n_out):
                    out_ref[0, q] = Oall[:r2, q * RCOLS:(q + 1) * RCOLS]

    def run(packed, c2b, active=None):
        nch = packed.shape[0] // CHUNK
        nb3 = nb * nb * nb
        if active is None:
            active = jnp.ones((nch,), jnp.int32)
        if select_out:
            out_shape = jax.ShapeDtypeStruct(
                (nb3, n_out, r2, RCOLS), jnp.float32
            )
            out_spec = pl.BlockSpec(
                (1, n_out, r2, RCOLS), lambda i, c2b, act: (c2b[i], 0, 0, 0)
            )
        else:
            out_shape = jax.ShapeDtypeStruct((nb3, r2pad, QCOLS), jnp.float32)
            out_spec = pl.BlockSpec(
                (1, r2pad, QCOLS), lambda i, c2b, act: (c2b[i], 0, 0)
            )
        in_specs = [pl.BlockSpec((CHUNK, PACK), lambda i, c2b, act: (i, 0))]
        args = [c2b, active, packed]
        if use_mxu:
            cm = jnp.asarray(_consts_np(m))
            mzw = jnp.asarray(_consts_wcols_np(m))
            in_specs += [
                pl.BlockSpec(cm.shape, lambda i, c2b, act: (0, 0)),
                pl.BlockSpec(mzw.shape, lambda i, c2b, act: (0, 0)),
            ]
            args += [cm, mzw]
        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=2,
            grid=(nch,),
            in_specs=in_specs,
            out_specs=out_spec,
            scratch_shapes=[pltpu.VMEM((r2pad, wcols), jnp.float32)],
        )
        return pl.pallas_call(kernel, out_shape=out_shape,
                              grid_spec=grid_spec)(*args)

    return run


# ------------------------------------------------------------- halo sweeps

def _roll(x, shift: int, axis: int):
    """pltpu.roll with negative shifts normalized (roll is cyclic)."""
    size = x.shape[axis]
    shift = shift % size
    if shift == 0:
        return x
    return pltpu.roll(x, shift, axis)


def _shift_mask(x, region, shift_rows: int, shift_cols: int, axis_mask):
    """roll + validity mask; axis_mask is a (rows, cols) float lattice
    prepared by the caller (1 where the shifted value is in-range)."""
    if shift_rows:
        x = _roll(x, shift_rows, 0)
    if shift_cols:
        x = _roll(x, shift_cols, 1)
    return x * axis_mask


@functools.lru_cache(maxsize=None)
def _make_sweep_yz(m: int, nb: int):
    """Merge halo contributions along the y (row-minor) and z (lane)
    axes: out(b) = sum_{ej,ek} shift(in(b - (0,ej,ek)))."""
    region = _region(m)
    r2pad = _r2pad(m)

    def kernel(*refs):
        out_ref = refs[-1]
        j = pl.program_id(1)
        k = pl.program_id(2)
        row = jax.lax.broadcasted_iota(jnp.int32, (r2pad, QCOLS), 0)
        col = jax.lax.broadcasted_iota(jnp.int32, (r2pad, QCOLS), 1)
        b0 = row % region
        z0 = col // CQ
        zlive = (z0 < region)

        tot = jnp.zeros((r2pad, QCOLS), jnp.float32)
        idx = 0
        for ej in (-1, 0, 1):
            for ek in (-1, 0, 1):
                x = refs[idx][0]
                idx += 1
                if ej == 0 and ek == 0:
                    tot = tot + x
                    continue
                valid = zlive
                if ej == 1:
                    valid = valid & (b0 >= BLOCK)
                elif ej == -1:
                    valid = valid & (b0 < region - BLOCK)
                if ek == 1:
                    valid = valid & (z0 >= BLOCK)
                elif ek == -1:
                    valid = valid & (z0 < region - BLOCK)
                edge = jnp.float32(1.0)
                if ej != 0:
                    edge = edge * jnp.where(
                        (j + ej >= 0) & (j + ej < nb), 1.0, 0.0)
                if ek != 0:
                    edge = edge * jnp.where(
                        (k + ek >= 0) & (k + ek < nb), 1.0, 0.0)
                tot = tot + _shift_mask(
                    x, region, BLOCK * ej, BLOCK * CQ * ek,
                    valid.astype(jnp.float32) * edge,
                )
        out_ref[0] = tot

    def run(acc):
        nb3 = nb * nb * nb

        def mk_index(ej, ek):
            def index(i, j, k):
                jj = jnp.clip(j + ej, 0, nb - 1)
                kk = jnp.clip(k + ek, 0, nb - 1)
                return ((i * nb + jj) * nb + kk, 0, 0)
            return index

        in_specs = [
            pl.BlockSpec((1, r2pad, QCOLS), mk_index(ej, ek))
            for ej in (-1, 0, 1) for ek in (-1, 0, 1)
        ]
        return pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct((nb3, r2pad, QCOLS), jnp.float32),
            grid=(nb, nb, nb),
            in_specs=in_specs,
            out_specs=pl.BlockSpec(
                (1, r2pad, QCOLS), lambda i, j, k: ((i * nb + j) * nb + k,
                                                   0, 0)
            ),
        )(*([acc] * 9))

    return run


@functools.lru_cache(maxsize=None)
def _make_sweep_x_select(m: int, nb: int, n_out: int):
    """Merge halo contributions along x (row-major axis), then unpack
    the interleaved channels -> (NB^3, n_out, r2, RCOLS) regions."""
    region = _region(m)
    r2 = region * region
    r2pad = _r2pad(m)

    def kernel(xm_ref, x0_ref, xp_ref, out_ref):
        i = pl.program_id(0)
        row = jax.lax.broadcasted_iota(jnp.int32, (r2pad, QCOLS), 0)
        a0 = row // region
        tot = x0_ref[0]
        for ei, ref in ((-1, xm_ref), (1, xp_ref)):
            if ei == 1:
                valid = (a0 >= BLOCK) & (a0 < region)
            else:
                valid = a0 < region - BLOCK
            edge = jnp.where((i + ei >= 0) & (i + ei < nb), 1.0, 0.0)
            tot = tot + _shift_mask(
                ref[0], region, BLOCK * region * ei, 0,
                valid.astype(jnp.float32) * edge,
            )
        # ONE batched de-interleave matmul: q folded into the lane dim
        # of the selection matrix, per-q writes slice at aligned offsets
        cin = jax.lax.broadcasted_iota(jnp.int32, (QCOLS, n_out * RCOLS), 0)
        cidx = jax.lax.broadcasted_iota(
            jnp.int32, (QCOLS, n_out * RCOLS), 1
        )
        qout = cidx // RCOLS
        zout = cidx % RCOLS
        z_src = cin // CQ
        q_src = cin % CQ
        Sall = ((z_src == zout) & (z_src < region)
                & (q_src == qout)).astype(jnp.float32)
        Oall = _mm(tot, Sall)  # (r2pad, n_out*RCOLS)
        for q in range(n_out):
            out_ref[0, q] = Oall[:r2, q * RCOLS:(q + 1) * RCOLS]

    def run(acc):
        nb3 = nb * nb * nb

        def mk_index(ei):
            def index(i, j, k):
                ii = jnp.clip(i + ei, 0, nb - 1)
                return ((ii * nb + j) * nb + k, 0, 0)
            return index

        return pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct(
                (nb3, n_out, r2, RCOLS), jnp.float32
            ),
            grid=(nb, nb, nb),
            in_specs=[
                pl.BlockSpec((1, r2pad, QCOLS), mk_index(ei))
                for ei in (-1, 0, 1)
            ],
            out_specs=pl.BlockSpec(
                (1, n_out, r2, RCOLS),
                lambda i, j, k: ((i * nb + j) * nb + k, 0, 0, 0),
            ),
        )(acc, acc, acc)

    return run


# ------------------------------------------------- transposed sweeps (VJP)

@functools.lru_cache(maxsize=None)
def _make_unsweep_x(m: int, nb: int, n_out: int):
    """Transpose of sweep_x_select: region cotangents (NB^3, n_out, r2,
    RCOLS) -> interleaved (NB^3, r2pad, QCOLS), summing each out-block's
    contribution back from its x neighbors with opposite shifts."""
    region = _region(m)
    r2 = region * region
    r2pad = _r2pad(m)

    def kernel(xm_ref, x0_ref, xp_ref, out_ref):
        i = pl.program_id(0)
        row = jax.lax.broadcasted_iota(jnp.int32, (r2pad, QCOLS), 0)
        a0 = row // region

        # Sel^T for ALL channels as ONE dot: the per-channel cotangents
        # lane-concatenate (aligned 128-lane blocks) and contract against
        # the row-stacked transposed selections (q*RCOLS + z rows).
        ridx = jax.lax.broadcasted_iota(
            jnp.int32, (n_out * RCOLS, QCOLS), 0
        )
        cout = jax.lax.broadcasted_iota(
            jnp.int32, (n_out * RCOLS, QCOLS), 1
        )
        qsel = ridx // RCOLS
        z_in = ridx % RCOLS
        z_dst = cout // CQ
        q_dst = cout % CQ
        Sall_t = ((z_in == z_dst) & (z_in < region)
                  & (q_dst == qsel)).astype(jnp.float32)

        def sel_t(ref):
            X = jnp.concatenate(
                [ref[0, q] for q in range(n_out)], axis=1
            )  # (r2, n_out*RCOLS)
            X = jnp.pad(X, ((0, r2pad - r2), (0, 0)))
            return _mm(X, Sall_t)  # (r2pad, QCOLS)

        tot = sel_t(x0_ref)
        # transpose of "out(i) += mask_e * roll_{+16R*e} in(i+e)":
        #   d_in(i) += roll_{-16R*e}( mask_e * d_out(i-e) )
        # so the e=+1 term reads the i-1 neighbor (xm) and vice versa;
        # the mask is the forward mask of e, applied in out coords
        # BEFORE the inverse roll.
        for ei, ref in ((1, xm_ref), (-1, xp_ref)):
            if ei == 1:
                valid = (a0 >= BLOCK) & (a0 < region)
            else:
                valid = a0 < region - BLOCK
            edge = jnp.where((i - ei >= 0) & (i - ei < nb), 1.0, 0.0)
            y = sel_t(ref) * valid.astype(jnp.float32) * edge
            tot = tot + _roll(y, -BLOCK * region * ei, 0)
        out_ref[0] = tot

    def run(rbar):
        nb3 = nb * nb * nb

        def mk_index(ei):
            def index(i, j, k):
                ii = jnp.clip(i + ei, 0, nb - 1)
                return ((ii * nb + j) * nb + k, 0, 0, 0)
            return index

        return pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct((nb3, r2pad, QCOLS), jnp.float32),
            grid=(nb, nb, nb),
            in_specs=[
                pl.BlockSpec((1, n_out, r2, RCOLS), mk_index(ei))
                for ei in (-1, 0, 1)
            ],
            out_specs=pl.BlockSpec(
                (1, r2pad, QCOLS),
                lambda i, j, k: ((i * nb + j) * nb + k, 0, 0),
            ),
        )(rbar, rbar, rbar)

    return run


@functools.lru_cache(maxsize=None)
def _make_unsweep_yz_compact(m: int, nb: int, n_out: int):
    """Transpose of sweep_yz followed by a channel de-interleave,
    emitting the compact 4-channel region cotangent (NB^3, n_out, r2,
    RCOLS) consumed by the v3 moment-backward kernel
    (ops/transfer_bwd_pallas.py) — which folds the combine adjoint's
    coordinate factors itself, so no 13-channel expansion is built."""
    region = _region(m)
    r2 = region * region
    r2pad = _r2pad(m)

    def kernel(*refs):
        out_ref = refs[-1]
        j = pl.program_id(1)
        k = pl.program_id(2)
        row = jax.lax.broadcasted_iota(jnp.int32, (r2pad, QCOLS), 0)
        col = jax.lax.broadcasted_iota(jnp.int32, (r2pad, QCOLS), 1)
        b0 = row % region
        z0 = col // CQ
        zlive = z0 < region

        tot = jnp.zeros((r2pad, QCOLS), jnp.float32)
        idx = 0
        # same transpose-term structure as _make_unsweep_yz_expand
        for ej in (-1, 0, 1):
            for ek in (-1, 0, 1):
                x = refs[idx][0]
                idx += 1
                if ej == 0 and ek == 0:
                    tot = tot + x
                    continue
                valid = zlive
                if ej == -1:
                    valid = valid & (b0 >= BLOCK)
                elif ej == 1:
                    valid = valid & (b0 < region - BLOCK)
                if ek == -1:
                    valid = valid & (z0 >= BLOCK)
                elif ek == 1:
                    valid = valid & (z0 < region - BLOCK)
                edge = jnp.float32(1.0)
                if ej != 0:
                    edge = edge * jnp.where(
                        (j + ej >= 0) & (j + ej < nb), 1.0, 0.0)
                if ek != 0:
                    edge = edge * jnp.where(
                        (k + ek >= 0) & (k + ek < nb), 1.0, 0.0)
                y = x * valid.astype(jnp.float32) * edge
                if ej:
                    y = _roll(y, BLOCK * ej, 0)
                if ek:
                    y = _roll(y, BLOCK * CQ * ek, 1)
                tot = tot + y

        # batched de-interleave (see _make_sweep_x_select): one dot, per-
        # q writes at aligned lane offsets
        cin = jax.lax.broadcasted_iota(jnp.int32, (QCOLS, n_out * RCOLS), 0)
        cidx = jax.lax.broadcasted_iota(
            jnp.int32, (QCOLS, n_out * RCOLS), 1
        )
        qout = cidx // RCOLS
        zout = cidx % RCOLS
        z_src = cin // CQ
        q_src = cin % CQ
        Sall = ((z_src == zout) & (z_src < region)
                & (q_src == qout)).astype(jnp.float32)
        Oall = _mm(tot, Sall)
        for q in range(n_out):
            out_ref[0, q] = Oall[:r2, q * RCOLS:(q + 1) * RCOLS]

    def run(dbar):
        nb3 = nb * nb * nb

        def mk_index(ej, ek):
            def index(i, j, k):
                jj = jnp.clip(j + ej, 0, nb - 1)
                kk = jnp.clip(k + ek, 0, nb - 1)
                return ((i * nb + jj) * nb + kk, 0, 0)
            return index

        return pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct(
                (nb3, n_out, r2, RCOLS), jnp.float32
            ),
            grid=(nb, nb, nb),
            in_specs=[
                pl.BlockSpec((1, r2pad, QCOLS), mk_index(ej, ek))
                for ej in (-1, 0, 1) for ek in (-1, 0, 1)
            ],
            out_specs=pl.BlockSpec(
                (1, n_out, r2, RCOLS),
                lambda i, j, k: ((i * nb + j) * nb + k, 0, 0, 0),
            ),
        )(*([dbar] * 9))

    return run


@functools.lru_cache(maxsize=None)
def _make_unsweep_yz_expand(m: int, nb: int, n_mom: int, has_mass: bool,
                            scale: float):
    """Transpose of sweep_yz followed by the combine adjoint, emitting
    the accumulator cotangent in the moment-backward kernel's flat
    layout (NB^3, 13*r2pad, RCOLS) (ops/transfer_bwd_pallas.py)."""
    region = _region(m)
    r2pad = _r2pad(m)
    wcols = region * CPAD
    C = 13

    def kernel(*refs):
        out_ref = refs[-1]
        j = pl.program_id(1)
        k = pl.program_id(2)
        row = jax.lax.broadcasted_iota(jnp.int32, (r2pad, QCOLS), 0)
        col = jax.lax.broadcasted_iota(jnp.int32, (r2pad, QCOLS), 1)
        b0 = row % region
        z0 = col // CQ
        zlive = z0 < region

        tot = jnp.zeros((r2pad, QCOLS), jnp.float32)
        idx = 0
        # the ref at offset (ej, ek) is d_out(j+ej, k+ek), which is the
        # transpose term e = (-ej, -ek): apply the forward mask of e in
        # out coords, then the inverse roll (= roll by +BLOCK*ej/ek).
        for ej in (-1, 0, 1):
            for ek in (-1, 0, 1):
                x = refs[idx][0]
                idx += 1
                if ej == 0 and ek == 0:
                    tot = tot + x
                    continue
                valid = zlive
                if ej == -1:
                    valid = valid & (b0 >= BLOCK)
                elif ej == 1:
                    valid = valid & (b0 < region - BLOCK)
                if ek == -1:
                    valid = valid & (z0 >= BLOCK)
                elif ek == 1:
                    valid = valid & (z0 < region - BLOCK)
                edge = jnp.float32(1.0)
                if ej != 0:
                    edge = edge * jnp.where(
                        (j + ej >= 0) & (j + ej < nb), 1.0, 0.0)
                if ek != 0:
                    edge = edge * jnp.where(
                        (k + ek >= 0) & (k + ek < nb), 1.0, 0.0)
                y = x * valid.astype(jnp.float32) * edge
                if ej:
                    y = _roll(y, BLOCK * ej, 0)
                if ek:
                    y = _roll(y, BLOCK * CQ * ek, 1)
                tot = tot + y

        # combine adjoint: d_acc = D@S0^T + (xa*D)@Sa^T + (xb*D)@Sb^T
        # + D@Szs^T, then expand interleaved cols to per-channel flat rows
        i0 = pl.program_id(0)
        oa = (i0 * BLOCK - m).astype(jnp.float32)
        ob = (j * BLOCK - m).astype(jnp.float32)
        oz = (k * BLOCK - m).astype(jnp.float32)
        S0, Sa, Sb, Szs = _combine_mats(
            region, r2pad, wcols, n_mom, has_mass, oz, scale
        )
        xa, xb = _row_coords(region, r2pad, scale, oa, ob)
        d_acc = (
            _mm_t(tot, S0) + xa * _mm_t(tot, Sa) + xb * _mm_t(tot, Sb)
            + _mm_t(tot, Szs)
        )  # (r2pad, wcols)

        cin = jax.lax.broadcasted_iota(jnp.int32, (wcols, RCOLS), 0)
        zout = jax.lax.broadcasted_iota(jnp.int32, (wcols, RCOLS), 1)
        z_src = cin // CPAD
        c_src = cin % CPAD
        zm = (z_src == zout) & (z_src < region)
        for c in range(C):
            Ec = (zm & (c_src == c)).astype(jnp.float32)
            out_ref[0, c * r2pad:(c + 1) * r2pad, :] = _mm(d_acc, Ec)

    def run(dbar):
        nb3 = nb * nb * nb

        def mk_index(ej, ek):
            def index(i, j, k):
                jj = jnp.clip(j + ej, 0, nb - 1)
                kk = jnp.clip(k + ek, 0, nb - 1)
                return ((i * nb + jj) * nb + kk, 0, 0)
            return index

        return pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct(
                (nb3, C * r2pad, RCOLS), jnp.float32
            ),
            grid=(nb, nb, nb),
            in_specs=[
                pl.BlockSpec((1, r2pad, QCOLS), mk_index(ej, ek))
                for ej in (-1, 0, 1) for ek in (-1, 0, 1)
            ],
            out_specs=pl.BlockSpec(
                (1, C * r2pad, RCOLS),
                lambda i, j, k: ((i * nb + j) * nb + k, 0, 0),
            ),
        )(*([dbar] * 9))

    return run


# ------------------------------------------------------------ public ops

# ---------------------------------------------- transposed (cols) variants
#
# FL_KORIENT=cols: the chunked kernels read the engine's SoA (C, N)
# layout directly as (rows, CHUNK) column blocks — particles in lanes,
# ab/z extents in sublanes.  This removes the (C, N) -> (NPAD, 128)
# pack transposes, the 128-col pads and the output-side relayouts
# (~1.5 ms/substep of XLA glue at 65k, r3 trace), and shrinks the ab
# extent from 384 lanes to 328 sublanes (the sublane tile is 8, not
# 128) — ~15% off every mask build, reduction and ab-sided dot.

def _korient() -> str:
    """Kernel I/O orientation, read at phase-build time (not import) so
    tests can parametrize both codepaths (FL_KORIENT in {rows, cols})."""
    return __import__("os").environ.get("FL_KORIENT", "cols")


def _onehot_w_t(w3, lb, ids):
    """W[row, p] = w3[ids[row, p] - lb[p]] for offsets 0..2 — the
    column-oriented twin of ``_onehot_w``: w3 (3, CHUNK) offset rows,
    lb (1, CHUNK) int, ids (EXT, 1) or (EXT, CHUNK) int row lattice."""
    off = ids - lb
    out = jnp.zeros(off.shape, jnp.float32)
    for o in range(3):
        out = out + jnp.where(off == o, w3[o:o + 1, :], 0.0)
    return out


def _pack13_t(fx, lbase_global, feats, order, valid, inv, block, m,
              presorted):
    """Transposed pack: sorted SoA rows (R, NPAD) — no transpose, no
    128-col pad.  Spline weights are computed AFTER the slot sort (3 fx
    rows sorted instead of 9 weight rows); dummy slots get fx = 0 whose
    weights are killed by the valid mask on the x-axis rows (zeroing
    one factor of T zeroes the particle's whole stencil)."""
    from fluidlab_tpu.core.bspline import quadratic_weights_soa
    from fluidlab_tpu.ops.binning import pack_rows, pin_rowmajor

    C = feats.shape[0]
    lb = (lbase_global - block * BLOCK + m).astype(jnp.float32)
    rows = jnp.concatenate([fx, lb, feats], axis=0)  # (6 + C, N)
    if not presorted:
        rows = pack_rows(rows, order, inv)
    # (offset, axis, N) -> axis-major rows [ax0: o0..o2 | ax1 | ax2]
    w9 = quadratic_weights_soa(rows[0:3]).transpose(1, 0, 2).reshape(9, -1)
    if not presorted:
        w9 = jnp.concatenate([w9[:3] * valid[None, :], w9[3:]], axis=0)
    out = jnp.concatenate([w9, rows[3:]], axis=0)  # (12 + C, NPAD)
    nr = max(12 + C, 12 + CPAD)
    nr = ((nr + 7) // 8) * 8
    out = jnp.pad(out, ((0, nr - out.shape[0]), (0, 0)))
    if presorted:
        out = pin_rowmajor(out)
    return out


def _pack_bwd_merged_t(fx, feats12, feats13, lbase_global, order, valid,
                       inv, block, m, presorted):
    """Transposed twin of ``_pack_bwd_merged``: row layout
    [w(9) lb(3) f12(12) pad(CPAD-12) wp(9) f13(13)] as SoA rows, both
    weight sets computed post-sort from the 3 sorted fx rows."""
    from fluidlab_tpu.core.bspline import (
        quadratic_dweights_soa,
        quadratic_weights_soa,
    )
    from fluidlab_tpu.ops.binning import pack_rows, pin_rowmajor

    lb = (lbase_global - block * BLOCK + m).astype(jnp.float32)
    rows = jnp.concatenate([fx, lb, feats12, feats13], axis=0)  # (31, N)
    if not presorted:
        rows = pack_rows(rows, order, inv)
    fx_s = rows[0:3]
    # (offset, axis, N) -> axis-major rows [ax0: o0..o2 | ax1 | ax2]
    w9 = quadratic_weights_soa(fx_s).transpose(1, 0, 2).reshape(9, -1)
    wp9 = quadratic_dweights_soa(fx_s).transpose(1, 0, 2).reshape(9, -1)
    if not presorted:
        w9 = jnp.concatenate([w9[:3] * valid[None, :], w9[3:]], axis=0)
    npad_n = rows.shape[-1]
    zpad = jnp.zeros((CPAD - 12, npad_n), rows.dtype)
    out = jnp.concatenate([
        w9, rows[3:6], rows[6:18], zpad, wp9, rows[18:31],
    ], axis=0)  # (34 + CPAD, NPAD)
    nr = ((out.shape[0] + 7) // 8) * 8
    out = jnp.pad(out, ((0, nr - out.shape[0]), (0, 0)))
    if presorted:
        out = pin_rowmajor(out)
    return out


@functools.lru_cache(maxsize=None)
def _make_accumulate_regions_t(m: int, nb: int, n_mom: int,
                               has_mass: bool, scale: float,
                               select_out: bool, grad: bool = False):
    """Column-oriented twin of ``_make_accumulate_regions``: reads the
    (R, NPAD) sorted SoA buffer as (R, CHUNK) column blocks, builds the
    ab masks at 328 sublanes instead of 384 lanes, and contracts over
    the particle LANES.  The accumulator and epilogue are the same
    (ab rows x zc cols) algebra."""
    from fluidlab_tpu.ops.p2g_pallas import _r2s as _r2s_fn

    region = _region(m)
    r2 = region * region
    r2pad = _r2pad(m)
    r2s = _r2s_fn(m)
    wcols = region * CPAD
    n_out = n_mom + (1 if has_mass else 0)

    from fluidlab_tpu.ops.masks import acc_dot as _adot
    from fluidlab_tpu.ops.masks import grad_dot_mode as _gmode

    def _adotk(a, b, dims):
        return _adot(a, b, dims, mode=_gmode() if grad else None)

    def _mmk(a, b):
        return _adotk(a, b, (((1,), (0,)), ((), ())))

    def kernel(c2b_ref, act_ref, packed_ref, out_ref, acc_ref):
        i = pl.program_id(0)
        nch = pl.num_programs(0)
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

        @pl.when(act_ref[i] != 0)
        def _():
            pk = packed_ref[...]  # (R, CHUNK)
            lbi = pk[9:12].astype(jnp.int32)
            feats = pk[12:12 + CPAD]  # (CPAD, CHUNK)

            row = jax.lax.broadcasted_iota(jnp.int32, (r2s, 1), 0)
            a_row = jnp.minimum(row // region, region - 1)
            b_row = row % region
            rv = (row < r2).astype(jnp.float32)
            T = (
                _onehot_w_t(pk[0:3], lbi[0:1], a_row)
                * _onehot_w_t(pk[3:6], lbi[1:2], b_row)
                * rv
            )  # (r2s, CHUNK)

            wrow = jax.lax.broadcasted_iota(jnp.int32, (wcols, 1), 0)
            c_wrow = wrow // CPAD
            p_rows = jax.lax.broadcasted_iota(jnp.int32, (wcols, CPAD), 0)
            p_cols = jax.lax.broadcasted_iota(jnp.int32, (wcols, CPAD), 1)
            p_tile = (p_rows % CPAD == p_cols).astype(jnp.float32)
            feats_tiled = _mmk(p_tile, feats)  # (wcols, CHUNK)
            W2 = _onehot_w_t(pk[6:9], lbi[2:3], c_wrow) * feats_tiled

            acc_ref[...] += _adotk(
                T, W2, (((1,), (1,)), ((), ()))
            )  # (r2s, wcols)

        @pl.when(last)
        def _():
            b = c2b_ref[i]
            bi = b // (nb * nb)
            bj = (b // nb) % nb
            bk = b % nb
            oa = (bi * BLOCK - m).astype(jnp.float32)
            ob = (bj * BLOCK - m).astype(jnp.float32)
            oz = (bk * BLOCK - m).astype(jnp.float32)
            acc = acc_ref[...]
            xa, xb = _row_coords(region, r2s, scale, oa, ob)
            if not select_out:
                S0, Sa, Sb, Szs = _combine_mats(
                    region, r2s, wcols, n_mom, has_mass, oz, scale
                )
                O = (
                    _mmk(acc, S0) + xa * _mmk(acc, Sa)
                    + xb * _mmk(acc, Sb) + _mmk(acc, Szs)
                )  # (r2s, QCOLS)
                out_ref[0] = jnp.pad(O, ((0, r2pad - r2s), (0, 0)))
            else:
                ncols = n_out * RCOLS
                cin = jax.lax.broadcasted_iota(jnp.int32, (wcols, ncols), 0)
                cidx = jax.lax.broadcasted_iota(jnp.int32, (wcols, ncols), 1)
                qout = cidx // RCOLS
                zout = cidx % RCOLS
                z_src = cin // CPAD
                c_src = cin % CPAD
                zm = (z_src == zout) & (z_src < region)
                ismom = qout < n_mom
                S0 = zm & (
                    (ismom & (c_src == qout))
                    | (has_mass & (qout == n_mom) & (c_src == 12))
                )
                Sa = zm & ismom & (c_src == 3 + 3 * qout + 0)
                Sb = zm & ismom & (c_src == 3 + 3 * qout + 1)
                Sz = zm & ismom & (c_src == 3 + 3 * qout + 2)
                xz = (oz + zout.astype(jnp.float32)) * scale
                Oall = (
                    _mmk(acc, S0.astype(jnp.float32))
                    + xa * _mmk(acc, Sa.astype(jnp.float32))
                    + xb * _mmk(acc, Sb.astype(jnp.float32))
                    + _mmk(acc, Sz.astype(jnp.float32) * xz)
                )  # (r2s, n_out*RCOLS)
                for q in range(n_out):
                    out_ref[0, q] = Oall[:r2, q * RCOLS:(q + 1) * RCOLS]

    def run(packed, c2b, active=None):
        npad_n = packed.shape[-1]
        nch = npad_n // CHUNK
        nb3 = nb * nb * nb
        nr = packed.shape[0]
        if active is None:
            active = jnp.ones((nch,), jnp.int32)
        if select_out:
            out_shape = jax.ShapeDtypeStruct(
                (nb3, n_out, r2, RCOLS), jnp.float32
            )
            out_spec = pl.BlockSpec(
                (1, n_out, r2, RCOLS), lambda i, c2b, act: (c2b[i], 0, 0, 0)
            )
        else:
            out_shape = jax.ShapeDtypeStruct((nb3, r2pad, QCOLS), jnp.float32)
            out_spec = pl.BlockSpec(
                (1, r2pad, QCOLS), lambda i, c2b, act: (c2b[i], 0, 0)
            )
        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=2,
            grid=(nch,),
            in_specs=[pl.BlockSpec((nr, CHUNK), lambda i, c2b, act: (0, i))],
            out_specs=out_spec,
            scratch_shapes=[pltpu.VMEM((r2s, wcols), jnp.float32)],
        )
        return pl.pallas_call(kernel, out_shape=out_shape,
                              grid_spec=grid_spec)(c2b, active, packed)

    return run


def _pack13(w, lbase_global, feats, order, valid, inv, block, m, presorted):
    """Shared packing prologue (ops/p2g_pallas.py layout)."""
    lb = (lbase_global - block * BLOCK + m).astype(jnp.float32)
    rows = jnp.concatenate([w[:, 0], w[:, 1], w[:, 2], lb, feats], axis=0)
    if not presorted:
        from fluidlab_tpu.ops.binning import pack_rows

        rows = pack_rows(rows, order, inv)
        rows = jnp.concatenate([rows[:3] * valid[None, :], rows[3:]], axis=0)
    rows = jnp.pad(rows, ((0, PACK - rows.shape[0]), (0, 0)))
    if presorted:
        from fluidlab_tpu.ops.binning import pin_rowmajor

        rows = pin_rowmajor(rows)  # stop {0,1} carry-layout propagation
    return rows.T  # (NPAD, PACK)


@functools.partial(jax.custom_vjp, nondiff_argnums=(8, 9, 10, 11))
def p2g_regions_core(fx, lbase_global, feats, order, valid, inv, starts,
                     block, G: int, m: int, presorted: bool,
                     interpret: bool):
    """Fully-summed per-block grid regions (NB^3, 4, r2, RCOLS) with
    channels [mom_xyz, mass]; mom already combined with the global cell
    position (x_cell = cell * dx is folded in via scale=dx upstream).

    The custom VJP boundary sits at ``fx`` (not the 9 spline weights):
    the backward contracts derivative-weight stencils and returns d_fx
    directly (ops/transfer_bwd_pallas.py v3 kernel), which collapses
    the 9 weight marginals to 3 and keeps the cotangent regions in
    their compact 4-channel form."""
    return _p2g_regions_fwd(
        fx, lbase_global, feats, order, valid, inv, starts, block, G, m,
        presorted, interpret,
    )[0]


def _p2g_regions_impl(fx, lbase_global, feats, order, valid, inv, starts,
                      block, G, m, presorted, interpret, scale):
    from fluidlab_tpu.core.bspline import quadratic_weights_soa

    nb = G // BLOCK
    w = quadratic_weights_soa(fx)
    packed = _pack13(w, lbase_global, feats, order, valid, inv, block, m,
                     presorted)
    c2b = chunk_to_block(starts, packed.shape[0])

    acc_fn = _make_accumulate_regions(m, nb, 3, True, scale, False,
                                      _use_mxu())
    syz = _make_sweep_yz(m, nb)
    sxs = _make_sweep_x_select(m, nb, 4)

    def run():
        acc = acc_fn(packed, c2b)
        return sxs(syz(acc))

    if interpret:
        with pltpu.force_tpu_interpret_mode():
            return run()
    return run()


def _p2g_regions_fwd(fx, lbase_global, feats, order, valid, inv, starts,
                     block, G, m, presorted, interpret):
    from fluidlab_tpu.ops.p2g_pallas import _dx_scale

    out = _p2g_regions_impl(
        fx, lbase_global, feats, order, valid, inv, starts, block, G, m,
        presorted, interpret, _dx_scale(G),
    )
    return out, (fx, lbase_global, feats, order, valid, inv, starts, block)


def _p2g_regions_bwd(G, m, presorted, interpret, res, rbar):
    from fluidlab_tpu.ops.p2g_pallas import _dx_scale
    from fluidlab_tpu.ops.transfer_bwd_pallas import transfer_bwd_fx

    fx, lbase, feats, order, valid, inv, starts, block = res
    nb = G // BLOCK
    scale = _dx_scale(G)

    usx = _make_unsweep_x(m, nb, 4)
    uyz = _make_unsweep_yz_compact(m, nb, 4)

    def run():
        return uyz(usx(rbar))

    if interpret:
        with pltpu.force_tpu_interpret_mode():
            compact = run()
    else:
        compact = run()

    d_feats, d_fx = transfer_bwd_fx(
        fx, lbase, feats, compact, order, valid, inv, starts, block,
        G, m, presorted, interpret, nq=3, has_mass=True,
        need_dfeats=True, scale=scale,
    )
    return d_fx, None, d_feats, None, None, None, None, None


p2g_regions_core.defvjp(_p2g_regions_fwd, _p2g_regions_bwd)


def p2g_regions(base, fx, usedf, mass, v, affine, G, dx, binning,
                m: int = 0, presorted: bool = False, interpret: bool = False):
    """Region-space P2G: (NB^3, 4, r2, RCOLS) fully-summed grid regions.
    Same feature prep as ops/p2g_pallas.py p2g_pallas; spline weights
    are derived from ``fx`` inside the core (see p2g_regions_core)."""
    from fluidlab_tpu.core.mat3 import mv_soa

    x_p = (base.astype(v.dtype) + fx) * dx
    Ax = mv_soa(affine, x_p)
    b = jnp.stack([mass * v[i] - Ax[i] for i in range(3)])
    feats = jnp.concatenate(
        [b, affine, mass[None, :]], axis=0
    ) * usedf[None, :]
    return p2g_regions_core(
        fx, base, feats, binning.order, binning.valid, binning.inv,
        binning.starts, binning.block, G, m, presorted, interpret,
    )


# ----------------------------------------- fused grid phase (single VJP)

def _pack_bwd_merged(w, wp, lbase_global, feats12, feats13, order, valid,
                     inv, block, m, presorted):
    """Packed rows for the fused backward: ONE buffer feeds both the
    d_vregions accumulate kernel (reads cols 0:12 + feats at 12:12+CPAD)
    and the merged moment-backward kernel (ops/transfer_bwd_pallas.py
    _make_bwd_kernel_merged): w(9) lb(3) feats12(12) pad wp(9)
    feats13(13)."""
    from fluidlab_tpu.ops.transfer_bwd_pallas import PACKB

    N = w.shape[-1]
    lb = (lbase_global - block * BLOCK + m).astype(jnp.float32)
    zpad = jnp.zeros((CPAD - 12, N), feats12.dtype)
    rows = jnp.concatenate([
        w[:, 0], w[:, 1], w[:, 2], lb, feats12, zpad,
        wp[:, 0], wp[:, 1], wp[:, 2], feats13,
    ], axis=0)
    if not presorted:
        from fluidlab_tpu.ops.binning import pack_rows

        rows = pack_rows(rows, order, inv)
        rows = jnp.concatenate([rows[:3] * valid[None, :], rows[3:]], axis=0)
    rows = jnp.pad(rows, ((0, PACKB - rows.shape[0]), (0, 0)))
    if presorted:
        from fluidlab_tpu.ops.binning import pin_rowmajor

        rows = pin_rowmajor(rows)  # stop {0,1} carry-layout propagation
    return rows.T  # (NPAD, PACKB)


def make_grid_phase(gridop_fn, G: int, m: int, presorted: bool,
                    interpret: bool, psum_axis=None):
    """Fused region-space grid phase with a single custom VJP:

        gridreg = p2g accumulate + halo sweeps        [pallas]
        vreg    = gridop_fn(gridreg, vop)             [pointwise XLA]
        S0, S1g = g2p moments from vreg               [pallas]

    vs the split p2g_regions/g2p_regions pair this shares one packed-row
    buffer between the P2G and G2P kernels in the forward (the G2P
    kernel reads the layout's first 12 columns), and the backward runs
    ONE merged moment kernel for both transfer VJPs (shared masks and
    z-stencil contractions; see _make_bwd_kernel_merged) plus a single
    pack/unpack round-trip instead of two.

    ``gridop_fn(gridreg, vop) -> vreg`` must be a pure jax function of
    the (NB^3, 4, r2, RCOLS) grid regions and a differentiable pytree
    ``vop`` (its VJP is taken with jax.vjp in the backward, recomputing
    the pointwise forward from the saved gridreg).

    Returns ``phase(fx, base, feats13, vop, binning) -> (S0, S1g)``.
    Reference semantics: the grid side of mpm_simulator.py:331-426.
    """
    from fluidlab_tpu.core.bspline import (
        quadratic_dweights_soa,
        quadratic_weights_soa,
    )
    from fluidlab_tpu.ops.g2p_pallas import _make_g2p_blocks
    from fluidlab_tpu.ops.p2g_pallas import _dx_scale
    from fluidlab_tpu.ops.transfer_bwd_pallas import _make_bwd_kernel_merged

    nb = G // BLOCK
    scale_p = _dx_scale(G)

    use_cols = _korient() == "cols"

    def _fwd(fx, base, feats13, vop, order, valid, inv, starts, block):
        if use_cols:
            packed = _pack13_t(fx, base, feats13, order, valid, inv,
                               block, m, presorted)
            npad = packed.shape[-1]
            acc_fn = _make_accumulate_regions_t(m, nb, 3, True, scale_p,
                                                False)
        else:
            w = quadratic_weights_soa(fx)
            packed = _pack13(w, base, feats13, order, valid, inv, block,
                             m, presorted)
            npad = packed.shape[0]
            acc_fn = _make_accumulate_regions(m, nb, 3, True, scale_p,
                                              False, _use_mxu())
        c2b = chunk_to_block(starts, npad)
        active = chunk_active(valid)
        N = fx.shape[-1]

        syz = _make_sweep_yz(m, nb)
        sxs = _make_sweep_x_select(m, nb, 4)

        def run_acc():
            return acc_fn(packed, c2b, active)

        if interpret:
            with pltpu.force_tpu_interpret_mode():
                acc = run_acc()
        else:
            acc = run_acc()
        if psum_axis is not None:
            # spatial sharding (parallel/spatial.py): each device
            # accumulated only its local particle shard; every block has
            # >= 1 chunk (ops/binning.py cpad), so empty blocks are
            # exact zeros and ONE all-reduce of the interleaved
            # accumulator (the smallest buffer in the phase) totals the
            # grid.  Sweeps/grid_op then run replicated.
            acc = jax.lax.psum(acc, psum_axis)

        def run_sweeps():
            return sxs(syz(acc))

        if interpret:
            with pltpu.force_tpu_interpret_mode():
                gridreg = run_sweeps()
        else:
            gridreg = run_sweeps()

        vreg = gridop_fn(gridreg, vop)

        if use_cols:
            from fluidlab_tpu.ops.g2p_pallas import _make_g2p_blocks_t

            g2p_fn = _make_g2p_blocks_t(m)
        else:
            g2p_fn = _make_g2p_blocks(m, _use_mxu())
        if interpret:
            with pltpu.force_tpu_interpret_mode():
                out = g2p_fn(packed, vreg, c2b, nb, npad, active)
        else:
            out = g2p_fn(packed, vreg, c2b, nb, npad, active)

        if use_cols:
            res = out[:12]  # (12, NPAD) SoA rows straight off the kernel
            if not presorted:
                from fluidlab_tpu.ops.binning import unpack_cols

                res_t = unpack_cols(res, order, valid, inv)
            else:
                from fluidlab_tpu.ops.binning import pin_rowmajor

                res_t = pin_rowmajor(res)
        else:
            res = out[:npad, :12]
            if not presorted:
                from fluidlab_tpu.ops.binning import unpack_rows

                res = unpack_rows(res, order, valid, inv)
            res_t = res.T
            if presorted:
                from fluidlab_tpu.ops.binning import pin_rowmajor

                res_t = pin_rowmajor(res_t)
        S0 = res_t[:3]
        S1loc = res_t[3:12]
        borig = (block * BLOCK - m).astype(jnp.float32)
        S1g = jnp.stack([
            S1loc[3 * i + d] + borig[d] * S0[i]
            for i in range(3) for d in range(3)
        ])
        # residual: the INTERLEAVED accumulator (NB^3, r2pad, QCOLS), not
        # the 3.4x larger per-channel gridreg — the backward re-runs the
        # cheap halo sweeps (~0.13 ms) instead of stacking 42.5 MB per
        # substep of residuals at 64^3 (scan-carry DUS traffic + HBM
        # residency at long horizons)
        saved = (fx, base, feats13, vop, acc, order, valid, inv,
                 starts, block)
        return (S0, S1g), saved

    def _bwd(res, cots):
        fx, base, feats13, vop, acc, order, valid, inv, starts, \
            block = res
        S0bar, S1bar = cots

        # rebuild the per-channel grid regions from the saved interleaved
        # accumulator (already psum-totaled under sharding)
        syz_b = _make_sweep_yz(m, nb)
        sxs_b = _make_sweep_x_select(m, nb, 4)
        if interpret:
            with pltpu.force_tpu_interpret_mode():
                gridreg = sxs_b(syz_b(acc))
        else:
            gridreg = sxs_b(syz_b(acc))

        # 1. d_vregions: each block's own particles only touch its own
        # region (no halo merge in this direction) — one accumulate
        # kernel over the cotangent features, global cell coordinates.
        feats12 = jnp.concatenate([S0bar, S1bar], axis=0)
        if use_cols:
            packed = _pack_bwd_merged_t(fx, feats12, feats13, base,
                                        order, valid, inv, block, m,
                                        presorted)
            npad = packed.shape[-1]
            acc_fn = _make_accumulate_regions_t(m, nb, 3, False, 1.0,
                                                True, grad=True)
        else:
            w = quadratic_weights_soa(fx)
            wp = quadratic_dweights_soa(fx)
            packed = _pack_bwd_merged(w, wp, base, feats12, feats13,
                                      order, valid, inv, block, m,
                                      presorted)
            npad = packed.shape[0]
            acc_fn = _make_accumulate_regions(m, nb, 3, False, 1.0, True,
                                              _use_mxu(), grad=True)
        c2b = chunk_to_block(starts, npad)
        active = chunk_active(valid)
        if interpret:
            with pltpu.force_tpu_interpret_mode():
                d_vreg = acc_fn(packed, c2b, active)
        else:
            d_vreg = acc_fn(packed, c2b, active)

        # 2. grid_op VJP (pointwise XLA, recomputed from the saved
        # gridreg) -> region cotangent + vop cotangents + vreg primal
        # (the merged kernel's G2P operand).
        vreg, gop_vjp = jax.vjp(gridop_fn, gridreg, vop)
        d_gridreg, d_vop = gop_vjp(d_vreg)
        if psum_axis is not None:
            # d_vreg was accumulated from local particles only; the
            # total region cotangent sums over devices.  gop_vjp is
            # linear in the cotangent and identical on every device
            # (gridreg is replicated), so all-reduce its output once.
            # d_vop stays LOCAL: shard_map's transpose psums replicated
            # -input cotangents itself.
            d_gridreg = jax.lax.psum(d_gridreg, psum_axis)

        # 3. transposed sweeps -> compact 4-channel accumulate cotangent
        usx = _make_unsweep_x(m, nb, 4)
        uyz = _make_unsweep_yz_compact(m, nb, 4)
        if use_cols:
            from fluidlab_tpu.ops.transfer_bwd_pallas import (
                _make_bwd_kernel_merged_t,
            )

            mk = _make_bwd_kernel_merged_t(m, nb, scale_p, CPAD)
        else:
            mk = _make_bwd_kernel_merged(m, nb, scale_p, CPAD, _use_mxu())

        def run_bwd():
            compact = uyz(usx(d_gridreg))
            return mk(packed, compact, vreg, c2b, npad, active)

        if interpret:
            with pltpu.force_tpu_interpret_mode():
                out = run_bwd()
        else:
            out = run_bwd()

        if use_cols:
            rows = out[:16]  # (16, NPAD) SoA rows straight off the kernel
            if not presorted:
                from fluidlab_tpu.ops.binning import unpack_cols

                rows_t = unpack_cols(rows, order, valid, inv)
            else:
                from fluidlab_tpu.ops.binning import pin_rowmajor

                rows_t = pin_rowmajor(rows)
        else:
            rows = out[:npad, :16]
            if not presorted:
                from fluidlab_tpu.ops.binning import unpack_rows

                rows = unpack_rows(rows, order, valid, inv)
            rows_t = rows.T
            if presorted:
                from fluidlab_tpu.ops.binning import pin_rowmajor

                rows_t = pin_rowmajor(rows_t)
        d_feats13 = rows_t[:13]
        d_fx = rows_t[13:16]
        return (d_fx, None, d_feats13, d_vop, None, None, None, None, None)

    core = jax.custom_vjp(lambda *a: _fwd(*a)[0])
    core.defvjp(_fwd, _bwd)

    def phase(fx, base, feats13, vop, binning):
        return core(fx, base, feats13, vop, binning.order, binning.valid,
                    binning.inv, binning.starts, binning.block)

    return phase


# --------------------------------------------- G2P from velocity regions

@functools.partial(jax.custom_vjp, nondiff_argnums=(8, 9, 10, 11))
def g2p_regions_core(fx, base, vregions, order, valid, inv, starts, block,
                     G: int, m: int, presorted: bool, interpret: bool):
    """G2P moments from per-block velocity regions (NB^3, 3, r2, RCOLS):
    (S0 (3, N), S1_global (9, N)) as in ops/g2p_pallas.py.  VJP boundary
    at ``fx`` (see p2g_regions_core)."""
    return _g2p_regions_fwd(
        fx, base, vregions, order, valid, inv, starts, block, G, m,
        presorted, interpret,
    )[0]


def _g2p_regions_impl(fx, base, vregions, order, valid, inv, starts, block,
                      G, m, presorted, interpret):
    from fluidlab_tpu.core.bspline import quadratic_weights_soa
    from fluidlab_tpu.ops.g2p_pallas import PACKG, _make_g2p_blocks

    N = fx.shape[-1]
    npad = N if presorted else order.shape[0]
    nb = G // BLOCK

    w = quadratic_weights_soa(fx)
    lb = (base - block * BLOCK + m).astype(jnp.float32)
    rows = jnp.concatenate([w[:, 0], w[:, 1], w[:, 2], lb], axis=0)
    if not presorted:
        from fluidlab_tpu.ops.binning import pack_rows

        rows = pack_rows(rows, order, inv)
    rows = jnp.pad(rows, ((0, PACKG - 12), (0, 0)))
    if presorted:
        from fluidlab_tpu.ops.binning import pin_rowmajor

        rows = pin_rowmajor(rows)
    packed = rows.T
    c2b = chunk_to_block(starts, npad)

    fn = _make_g2p_blocks(m, _use_mxu())
    if interpret:
        with pltpu.force_tpu_interpret_mode():
            out = fn(packed, vregions, c2b, nb, npad)
    else:
        out = fn(packed, vregions, c2b, nb, npad)

    res = out[:npad, :12]
    if not presorted:
        from fluidlab_tpu.ops.binning import unpack_rows

        res = unpack_rows(res, order, valid, inv)
    res_t = res.T
    S0 = res_t[:3]
    S1loc = res_t[3:12]
    borig = (block * BLOCK - m).astype(jnp.float32)
    S1g = jnp.stack([
        S1loc[3 * i + d] + borig[d] * S0[i]
        for i in range(3) for d in range(3)
    ])
    return S0, S1g


def _g2p_regions_fwd(fx, base, vregions, order, valid, inv, starts, block,
                     G, m, presorted, interpret):
    out = _g2p_regions_impl(
        fx, base, vregions, order, valid, inv, starts, block, G, m,
        presorted, interpret,
    )
    return out, (fx, base, vregions, order, valid, inv, starts, block)


def _g2p_regions_bwd(G, m, presorted, interpret, res, cots):
    """d_vregions via the accumulate(+combine, scale=1) kernel over the
    cotangent features [S0bar | S1bar] (each block's own particles only
    touch its own region — no halo merge in this direction); d_fx via
    the v3 moment-backward kernel reading the velocity regions
    directly (coordinate factors folded in-kernel — no [v | v*cell]
    channel-grid build)."""
    from fluidlab_tpu.core.bspline import quadratic_weights_soa
    from fluidlab_tpu.ops.transfer_bwd_pallas import transfer_bwd_fx

    fx, base, vregions, order, valid, inv, starts, block = res
    S0bar, S1bar = cots
    nb = G // BLOCK

    w = quadratic_weights_soa(fx)
    feats12 = jnp.concatenate([S0bar, S1bar], axis=0)
    feats13 = jnp.concatenate(
        [feats12, jnp.zeros((1, S0bar.shape[-1]), S0bar.dtype)], axis=0
    )
    packed = _pack13(w, base, feats13, order, valid, inv, block, m,
                     presorted)
    c2b = chunk_to_block(starts, packed.shape[0])
    acc_fn = _make_accumulate_regions(m, nb, 3, False, 1.0, True,
                                          _use_mxu(), grad=True)
    if interpret:
        with pltpu.force_tpu_interpret_mode():
            d_vreg = acc_fn(packed, c2b)
    else:
        d_vreg = acc_fn(packed, c2b)

    _, d_fx = transfer_bwd_fx(
        fx, base, feats12, vregions, order, valid, inv, starts, block,
        G, m, presorted, interpret, nq=3, has_mass=False,
        need_dfeats=False, scale=1.0,
    )
    return d_fx, None, d_vreg, None, None, None, None, None


g2p_regions_core.defvjp(_g2p_regions_fwd, _g2p_regions_bwd)


def g2p_regions(base, fx, vregions, G, inv_dx, binning, m: int = 0,
                presorted: bool = False, interpret: bool = False):
    """Region-space G2P: (new_v (3, N), new_C (9, N)) from velocity
    regions — same math as ops/g2p_pallas.py g2p_pallas."""
    S0, S1g = g2p_regions_core(
        fx, base, vregions, binning.order, binning.valid, binning.inv,
        binning.starts, binning.block, G, m, presorted, interpret,
    )
    xg = base.astype(S0.dtype) + fx
    new_C = (4.0 * inv_dx) * jnp.stack([
        S1g[3 * i + d] - S0[i] * xg[d] for i in range(3) for d in range(3)
    ])
    return S0, new_C
