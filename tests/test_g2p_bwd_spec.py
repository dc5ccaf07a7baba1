"""Parity of the specialized G2P weight-backward kernel
(ops/g2p_bwd_spec.py) against the generic moment-backward path with the
12 coordinate-weighted channel grids (the form used by _g2p_core_bwd;
reference mpm_simulator.py:400-426)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from fluidlab_tpu.ops.binning import compute_binning
from fluidlab_tpu.ops.g2p_bwd_spec import g2p_weight_bwd
from fluidlab_tpu.ops.transfer_bwd_pallas import transfer_bwd


@pytest.mark.parametrize("m", [0, 2])
def test_matches_generic_path(m):
    G, N = 64, 900
    rng = np.random.RandomState(0)
    base = jnp.asarray(rng.randint(0, G - 3, size=(3, N)), jnp.int32)
    w = jnp.asarray(rng.uniform(0.1, 1.0, size=(3, 3, N)), jnp.float32)
    vout = jnp.asarray(rng.normal(size=(3, G * G * G)), jnp.float32)
    S0b = jnp.asarray(rng.normal(size=(3, N)), jnp.float32)
    S1b = jnp.asarray(rng.normal(size=(9, N)), jnp.float32)
    bn = compute_binning(base, G)

    ii = jax.lax.broadcasted_iota(jnp.int32, (G, G, G), 0).reshape(-1)
    jj = jax.lax.broadcasted_iota(jnp.int32, (G, G, G), 1).reshape(-1)
    kk = jax.lax.broadcasted_iota(jnp.int32, (G, G, G), 2).reshape(-1)
    cell = [ii.astype(jnp.float32), jj.astype(jnp.float32),
            kk.astype(jnp.float32)]
    grids12 = jnp.concatenate([
        vout,
        jnp.concatenate([
            vout[i][None, :] * cell[d][None, :]
            for i in range(3) for d in range(3)
        ], axis=0),
    ], axis=0)
    feats12 = jnp.concatenate([S0b, S1b], axis=0)
    _, d_w_ref = transfer_bwd(
        w, base, feats12, grids12, bn.order, bn.valid, bn.inv, bn.starts,
        bn.block, G, 0, False, True)

    d_w = g2p_weight_bwd(
        w, base, S0b, S1b, vout, bn.order, bn.valid, bn.inv, bn.starts,
        bn.block, G, m, False, True)
    np.testing.assert_allclose(
        np.asarray(d_w), np.asarray(d_w_ref), rtol=2e-4, atol=2e-4
    )
