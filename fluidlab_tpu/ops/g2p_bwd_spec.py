"""Specialized G2P weight-backward kernel: 3 region channels.

The G2P VJP's d_w needs, per particle, marginal stencil sums of

    e(cell) = sum_i v_i(cell) * (S0b_i + sum_d S1b_id * cell_d)

The generic moment-backward path (ops/transfer_bwd_pallas.py) feeds 12
channel grids [v_i | v_i * cell_d]; this kernel keeps only the 3 ``v``
channels and folds the cell-coordinate weights in-kernel: the a/b
coordinates are plane constants of the region layout, and z enters
through coordinate-weighted rows added to the one stacked z-contraction
(lhs = [Wz, Wz*zl, Iz_o, Iz_o*zl]).  Halves the MXU passes and shrinks
the XLA-side region build 4x (12 -> 3 channels of (NB^3, r2pad, 128)).

Reference semantics: the G2P kernel's Taichi autodiff tape
(reference mpm_simulator.py:400-426).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from fluidlab_tpu.ops.masks import acc_dot as _masks_acc_dot
from fluidlab_tpu.ops.masks import grad_dot_mode as _grad_dot_mode


def _acc_dot(a, b, dims):
    # backward-kernel dots run at the FL_GRAD_DOT strategy
    return _masks_acc_dot(a, b, dims, mode=_grad_dot_mode())
from fluidlab_tpu.ops.binning import (
    ALIGN,
    BLOCK,
    chunk_to_block,
    pack_rows,
    unpack_rows,
)

CHUNK = ALIGN
PACKB = 128  # packed row: w(9) lb(3) S0bar(3) S1bar(9)
OUTB = 128   # output row: d_w(9), ax-major


@functools.lru_cache(maxsize=None)
def _make_kernel(m: int, nb: int):
    from fluidlab_tpu.ops.g2p_pallas import RCOLS
    from fluidlab_tpu.ops.p2g_pallas import _r2pad, _region

    region = _region(m)
    r2 = region * region
    r2pad = _r2pad(m)

    def kernel(c2b_ref, packed_ref, regions_ref, out_ref):
        i_prog = pl.program_id(0)
        b = c2b_ref[i_prog]
        bxf = ((b // (nb * nb)) * BLOCK - m).astype(jnp.float32)
        byf = (((b // nb) % nb) * BLOCK - m).astype(jnp.float32)
        bzf = ((b % nb) * BLOCK - m).astype(jnp.float32)

        rflat = regions_ref[0]  # (3*r2pad, RCOLS)

        col = jax.lax.broadcasted_iota(jnp.int32, (CHUNK, r2pad), 1)
        a_col = jnp.minimum(col // region, region - 1)
        b_col = col % region
        col_valid = (col < r2).astype(jnp.float32)
        a_f = a_col.astype(jnp.float32)
        b_f = b_col.astype(jnp.float32)
        zcol = jax.lax.broadcasted_iota(jnp.int32, (CHUNK, RCOLS), 1)
        z_valid = (zcol < region).astype(jnp.float32)
        z_f = zcol.astype(jnp.float32)

        pk = packed_ref[...]
        wvals = (pk[:, 0:3], pk[:, 3:6], pk[:, 6:9])
        lvals = pk[:, 9:12].astype(jnp.int32)
        S0b = pk[:, 12:15]
        S1b = pk[:, 15:24]  # row-major (i, d)

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

        lhs = jnp.concatenate(
            [Wz, Wz * z_f] + Iz + [izo * z_f for izo in Iz], axis=0
        )  # (8*CHUNK, RCOLS)
        ZC = _acc_dot(lhs, rflat, (((1,), (1,)), ((), ())))  # (8*CHUNK, 3*r2pad)

        def ch(row, i):
            return ZC[row * CHUNK:(row + 1) * CHUNK,
                      i * r2pad:(i + 1) * r2pad]

        def e_plane(row_w, row_z):
            """sum_i P_i * A_i + beta_z_i * (B_i + bz * A_i) with A from
            lhs-row-group row_w and B from row_z."""
            E = jnp.zeros((CHUNK, r2pad), jnp.float32)
            for i in range(3):
                alpha = S0b[:, i:i + 1]
                bx_i = S1b[:, 3 * i + 0:3 * i + 1]
                by_i = S1b[:, 3 * i + 1:3 * i + 2]
                bz_i = S1b[:, 3 * i + 2:3 * i + 3]
                alpha_p = alpha + bx_i * bxf + by_i * byf + bz_i * bzf
                P = alpha_p + bx_i * a_f + by_i * b_f
                E = E + P * ch(row_w, i) + bz_i * ch(row_z, i)
            return E

        E = e_plane(0, 1)
        dw = []
        for o in range(3):
            dw.append(jnp.sum(
                indicator(lvals[:, 0:1], a_col, o, col_valid) * Wy * E,
                axis=1))
        for o in range(3):
            dw.append(jnp.sum(
                Wx * indicator(lvals[:, 1:2], b_col, o, col_valid) * E,
                axis=1))
        for o in range(3):
            dw.append(jnp.sum(T * e_plane(2 + o, 5 + o), axis=1))

        rows = jnp.stack(dw, axis=1)  # (CHUNK, 9)
        out_ref[...] = jnp.pad(rows, ((0, 0), (0, OUTB - 9)))

    def run(packed, regions, c2b, n_pad: int):
        nch = packed.shape[0] // CHUNK
        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(nch,),
            in_specs=[
                pl.BlockSpec((CHUNK, PACKB), lambda i, c2b: (i, 0)),
                pl.BlockSpec((1, 3 * r2pad, RCOLS),
                             lambda i, c2b: (c2b[i], 0, 0)),
            ],
            out_specs=pl.BlockSpec((CHUNK, OUTB), lambda i, c2b: (i, 0)),
        )
        return pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct((n_pad, OUTB), jnp.float32),
            grid_spec=grid_spec,
        )(c2b, packed, regions)

    return run


def g2p_weight_bwd(w, base, S0bar, S1bar, v_out, order, valid, inv, starts,
                   block, G: int, m: int, presorted: bool, interpret: bool):
    """d_w (3 off, 3 ax, N) for the G2P VJP from the 3 ``v_out``
    channels (parity with the generic transfer_bwd grids12 path:
    tests/test_transfer_bwd.py)."""
    from fluidlab_tpu.ops.transfer_bwd_pallas import _build_regions_flat

    N = w.shape[-1]
    npad = N if presorted else order.shape[0]
    nb = G // BLOCK

    lb = (base - block * BLOCK + m).astype(jnp.float32)
    rows = jnp.concatenate(
        [w[:, 0], w[:, 1], w[:, 2], lb, S0bar, S1bar], axis=0
    )  # (24, N)
    if not presorted:
        rows = pack_rows(rows, order, inv)
    rows = jnp.pad(rows, ((0, PACKB - 24), (0, 0)))
    packed = rows.T
    c2b = chunk_to_block(starts, npad)
    regions = _build_regions_flat(v_out, G, nb, m)

    fn = _make_kernel(m, nb)
    if interpret:
        with pltpu.force_tpu_interpret_mode():
            out = fn(packed, regions, c2b, npad)
    else:
        out = fn(packed, regions, c2b, npad)

    res = out[:npad, :9]
    if not presorted:
        res = unpack_rows(res, order, valid, inv)
    return res.T.reshape(3, 3, -1).transpose(1, 0, 2)  # (off, ax, N)
