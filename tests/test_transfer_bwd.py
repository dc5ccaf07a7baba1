"""Unit parity of the moment-backward kernel (ops/transfer_bwd_pallas.py)
against the 27-point gather formulation it replaced, in both VJP forms
(reference mpm_simulator.py:306-426 — the transfer kernels whose Taichi
autodiff tape these custom VJPs replace)."""

import jax
import jax.numpy as jnp
import numpy as np

from fluidlab_tpu.core.bspline import STENCIL
from fluidlab_tpu.ops.binning import compute_binning
from fluidlab_tpu.ops.transfer_bwd_pallas import transfer_bwd


def _inputs(seed, N, C, G):
    rng = np.random.RandomState(seed)
    base = jnp.asarray(rng.randint(0, G - 3, size=(3, N)), jnp.int32)
    w = jnp.asarray(rng.uniform(0.1, 1.0, size=(3, 3, N)), jnp.float32)
    feats = jnp.asarray(rng.normal(size=(C, N)), jnp.float32)
    gb = jnp.asarray(rng.normal(size=(C, G * G * G)), jnp.float32)
    return base, w, feats, gb


def _gather_reference(base, w, feats, gb, G):
    d_w = jnp.zeros_like(w)
    d_f = jnp.zeros_like(feats)
    for (oi, oj, ok) in [tuple(int(v) for v in o) for o in STENCIL]:
        idx = (base[0] + oi) * (G * G) + (base[1] + oj) * G + (base[2] + ok)
        gc = gb[:, idx]
        e = jnp.sum(gc * feats, axis=0)
        wprod = w[oi, 0] * w[oj, 1] * w[ok, 2]
        d_f = d_f + wprod[None, :] * gc
        d_w = d_w.at[oi, 0].add(w[oj, 1] * w[ok, 2] * e)
        d_w = d_w.at[oj, 1].add(w[oi, 0] * w[ok, 2] * e)
        d_w = d_w.at[ok, 2].add(w[oi, 0] * w[oj, 1] * e)
    return d_f, d_w


class TestMomentBackward:
    def test_p2g_form(self):
        """C=13 plain channel grids (the P2G VJP)."""
        G, N, C = 64, 900, 13
        base, w, feats, gb = _inputs(0, N, C, G)
        bn = compute_binning(base, G)
        d_f, d_w = transfer_bwd(
            w, base, feats, gb, bn.order, bn.valid, bn.inv, bn.starts,
            bn.block, G, 0, False, True,
        )
        d_f_ref, d_w_ref = _gather_reference(base, w, feats, gb, G)
        np.testing.assert_allclose(
            np.asarray(d_f), np.asarray(d_f_ref), rtol=2e-5, atol=1e-4
        )
        np.testing.assert_allclose(
            np.asarray(d_w), np.asarray(d_w_ref), rtol=2e-5, atol=1e-4
        )

    def test_g2p_form(self):
        """C=12 cell-coordinate channel grids (the G2P d_w VJP):
        e(cell) = sum_i g_i (S0bar_i + sum_d S1bar_id cell_d)."""
        G, N = 64, 900
        rng = np.random.RandomState(1)
        base = jnp.asarray(rng.randint(0, G - 3, size=(3, N)), jnp.int32)
        w = jnp.asarray(rng.uniform(0.1, 1.0, size=(3, 3, N)), jnp.float32)
        v_out = jnp.asarray(rng.normal(size=(3, G ** 3)), jnp.float32)
        S0bar = jnp.asarray(rng.normal(size=(3, N)), jnp.float32)
        S1bar = jnp.asarray(rng.normal(size=(9, N)), jnp.float32)
        bn = compute_binning(base, G)

        d_w_ref = jnp.zeros_like(w)
        for (oi, oj, ok) in [tuple(int(x) for x in o) for o in STENCIL]:
            idx = (
                (base[0] + oi) * (G * G) + (base[1] + oj) * G
                + (base[2] + ok)
            )
            g = v_out[:, idx]
            cellw = [
                (base[0] + oi).astype(jnp.float32),
                (base[1] + oj).astype(jnp.float32),
                (base[2] + ok).astype(jnp.float32),
            ]
            e = sum(
                g[i] * (
                    S0bar[i]
                    + sum(S1bar[3 * i + d] * cellw[d] for d in range(3))
                )
                for i in range(3)
            )
            d_w_ref = d_w_ref.at[oi, 0].add(w[oj, 1] * w[ok, 2] * e)
            d_w_ref = d_w_ref.at[oj, 1].add(w[oi, 0] * w[ok, 2] * e)
            d_w_ref = d_w_ref.at[ok, 2].add(w[oi, 0] * w[oj, 1] * e)

        ii = jax.lax.broadcasted_iota(jnp.int32, (G, G, G), 0).reshape(-1)
        jj = jax.lax.broadcasted_iota(jnp.int32, (G, G, G), 1).reshape(-1)
        kk = jax.lax.broadcasted_iota(jnp.int32, (G, G, G), 2).reshape(-1)
        cell = [x.astype(jnp.float32) for x in (ii, jj, kk)]
        grids12 = jnp.concatenate([
            v_out,
            jnp.concatenate([
                (v_out[i] * cell[d])[None, :]
                for i in range(3) for d in range(3)
            ], axis=0),
        ], axis=0)
        feats12 = jnp.concatenate([S0bar, S1bar], axis=0)
        _, d_w = transfer_bwd(
            w, base, feats12, grids12, bn.order, bn.valid, bn.inv,
            bn.starts, bn.block, G, 0, False, True,
        )
        scale = float(jnp.abs(d_w_ref).max())
        np.testing.assert_allclose(
            np.asarray(d_w) / scale, np.asarray(d_w_ref) / scale,
            atol=3e-6,
        )
