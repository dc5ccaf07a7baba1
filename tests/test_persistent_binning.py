"""Persistent (once-per-control-step) block binning: the TPU fast path.

With ``binning_mode='step'`` the particle state is permuted into a
padded block-sorted layout once per control step (engine/mpm.py
``_substeps_sorted``), the substeps run presorted (Pallas kernels skip
their argsort + permutation gathers), and the state is unsorted after.
These tests pin:
- trajectory parity vs. the reference scatter/gather path, including
  particle injection (slot remapping through ``Binning.inv``),
- gradient parity through the permutation custom-VJPs,
- the aligned padded CSR invariants of ops/binning.py.
"""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from fluidlab_tpu.engine.mpm import make_step
from fluidlab_tpu.ops.binning import ALIGN, BLOCK, compute_binning, padded_size
from fluidlab_tpu.utils.bench_scenes import liquid_block_scene


def _persist(cfg):
    return dataclasses.replace(
        cfg, p2g_impl="pallas", g2p_impl="pallas",
        binning_mode="step", binning_margin=2,
    )


class TestBinningLayout:
    def test_aligned_padded_csr(self):
        rng = np.random.RandomState(0)
        G, N = 64, 3000
        base = jnp.asarray(
            rng.randint(0, G - 3, size=(3, N)), dtype=jnp.int32
        )
        bn = compute_binning(base, G)
        starts = np.asarray(bn.starts)
        order = np.asarray(bn.order)
        valid = np.asarray(bn.valid)
        inv = np.asarray(bn.inv)
        nb = G // BLOCK
        assert starts.shape == (nb**3 + 1,)
        assert (starts % ALIGN == 0).all()
        assert starts[-1] <= padded_size(N, G)
        # every particle sits in exactly one valid slot, in its block
        assert valid.sum() == N
        assert (valid[inv] == 1.0).all()
        assert (order[inv] == np.arange(N)).all()
        block = np.asarray(bn.block)
        bid = (block[0] * nb + block[1]) * nb + block[2]
        for p in range(0, N, 517):
            s = inv[p]
            b = np.searchsorted(starts, s, side="right") - 1
            assert bid[p] == b

    def test_margin_required(self):
        cfg, _, _ = liquid_block_scene(n_particles=512, horizon=10)
        with pytest.raises(ValueError):
            make_step(dataclasses.replace(
                cfg, p2g_impl="pallas", binning_mode="step",
                binning_margin=0,
            ))


class TestPersistentParity:
    def test_trajectory_matches_reference(self):
        cfg, params, state = liquid_block_scene(
            n_particles=2048, horizon=10
        )
        step_ref = make_step(cfg)  # scatter/gather
        step_per = make_step(_persist(cfg))
        a = jnp.zeros((1,), jnp.float32)
        ha = jnp.asarray(False)
        sr = sp = state
        for _ in range(3):
            sr = step_ref(sr, params, a, ha)
            sp = step_per(sp, params, a, ha)
        np.testing.assert_allclose(
            np.asarray(sp.particles.x), np.asarray(sr.particles.x),
            atol=1e-6,
        )
        np.testing.assert_allclose(
            np.asarray(sp.particles.v), np.asarray(sr.particles.v),
            atol=1e-5,
        )
        assert (
            np.asarray(sp.particles.used) == np.asarray(sr.particles.used)
        ).all()

    def test_gradient_matches_reference(self):
        cfg, params, state = liquid_block_scene(
            n_particles=1024, horizon=10
        )
        a = jnp.zeros((1,), jnp.float32)
        ha = jnp.asarray(False)

        def make_grad(stepfn):
            def loss(v0, s):
                s = s.replace(particles=s.particles.replace(v=v0))
                s2 = stepfn(s, params, a, ha)
                return jnp.sum(s2.particles.v ** 2) + jnp.sum(
                    jnp.abs(s2.particles.x)
                )
            return jax.grad(loss)

        gr = make_grad(make_step(cfg))(state.particles.v, state)
        gp = make_grad(make_step(_persist(cfg)))(state.particles.v, state)
        gr, gp = np.asarray(gr), np.asarray(gp)
        scale = np.abs(gr).max()
        assert np.abs(gr - gp).max() < 1e-4 * max(scale, 1.0)


class TestPersistentInjection:
    def test_injection_parity(self):
        """LatteArt-style injector scene: persistent mode must land the
        injected particles in the same slots/positions as the reference
        path (Binning.inv remap inside _inject)."""
        from tests.test_envs_solver import TinyLatteArtEnv

        env_r = TinyLatteArtEnv(loss=False, seed=0)
        env_p = TinyLatteArtEnv(loss=False, seed=0)
        sim_p = env_p.sim
        sim_p.cfg = _persist(sim_p.cfg)
        sim_p._step_fn = jax.jit(  # rebuild with the persistent cfg
            make_step(sim_p.cfg, sim_p._smoke_step_fn)
        )

        rng = np.random.RandomState(1)
        for t in range(3):
            act = rng.uniform(-0.5, 0.5, env_r.action_space.shape)
            env_r.sim.step(act)
            env_p.sim.step(act)
        xr = np.asarray(env_r.sim.state.particles.x)
        xp = np.asarray(env_p.sim.state.particles.x)
        ur = np.asarray(env_r.sim.state.particles.used)
        up = np.asarray(env_p.sim.state.particles.used)
        assert (ur == up).all()
        assert ur.sum() > 0
        np.testing.assert_allclose(
            xp[:, ur], xr[:, ur], atol=1e-5,
        )
