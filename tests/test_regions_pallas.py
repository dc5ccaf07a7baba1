"""Region-space grid phase (ops/regions_pallas.py) equivalence.

The region pipeline must produce, for every block's halo region, exactly
the fully-summed canonical grid values (what _build_regions extracts
from the canonical grid), and its custom VJPs must match the canonical
Pallas path's gradients.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from fluidlab_tpu.core.bspline import base_and_fx_soa, quadratic_weights_soa
from fluidlab_tpu.ops.binning import BLOCK, compute_binning
from fluidlab_tpu.ops.g2p_pallas import _build_regions, g2p_pallas
from fluidlab_tpu.ops.p2g import p2g_scatter
from fluidlab_tpu.ops.p2g_pallas import p2g_pallas
from fluidlab_tpu.ops.regions_pallas import g2p_regions, p2g_regions


@pytest.fixture(scope="module")
def inputs():
    G = 32
    N = 900
    rng = np.random.default_rng(3)
    x = jnp.asarray(rng.uniform(0.08, 0.92, (3, N)).astype(np.float32))
    base, fx = base_and_fx_soa(x, float(G))
    base = jnp.clip(base, 0, G - 3)
    w = quadratic_weights_soa(fx)
    usedf = jnp.asarray((rng.uniform(size=N) > 0.2).astype(np.float32))
    mass = jnp.asarray(rng.uniform(0.5, 2.0, N).astype(np.float32))
    v = jnp.asarray(rng.normal(size=(3, N)).astype(np.float32))
    affine = jnp.asarray(0.1 * rng.normal(size=(9, N)).astype(np.float32))
    return base, fx, w, usedf, mass, v, affine, G, 1.0 / G


@pytest.mark.parametrize("m", [0, 1])
def test_p2g_regions_matches_canonical(inputs, m):
    base, fx, w, usedf, mass, v, affine, G, dx = inputs
    nb = G // BLOCK
    binning = compute_binning(base, G)
    grid = p2g_scatter(base, fx, w, usedf, mass, v, affine, G, dx)
    ref = _build_regions(grid, G, nb, m)  # (NB^3, 4, r2, RCOLS)
    out = p2g_regions(base, fx, usedf, mass, v, affine, G, dx,
                      binning, m=m, interpret=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=3e-5)


@pytest.mark.parametrize("m", [0, 1])
def test_g2p_regions_matches_canonical(inputs, m):
    base, fx, w, usedf, mass, v, affine, G, dx = inputs
    nb = G // BLOCK
    binning = compute_binning(base, G)
    rng = np.random.default_rng(7)
    v_out = jnp.asarray(rng.normal(size=(3, G * G * G)).astype(np.float32))
    vregions = _build_regions(v_out, G, nb, m)
    a_v, a_C = g2p_pallas(base, fx, w, v_out, G, float(G), interpret=True,
                          binning=binning, m=m)
    b_v, b_C = g2p_regions(base, fx, vregions, G, float(G), binning,
                           m=m, interpret=True)
    np.testing.assert_allclose(np.asarray(b_v), np.asarray(a_v), atol=3e-5)
    np.testing.assert_allclose(np.asarray(b_C), np.asarray(a_C), atol=3e-4)


def _roundtrip_regions(base, fx, w, usedf, mass, v, affine, G, dx, binning,
                       m):
    """p2g -> fake pointwise grid_op -> g2p, all in region space.
    ``w`` accepted for signature parity with the canonical roundtrip but
    unused — the region cores derive weights from ``fx``."""
    gridreg = p2g_regions(base, fx, usedf, mass, v, affine, G, dx,
                          binning, m=m, interpret=True)
    mass_r = gridreg[:, 3]
    inv_mass = 1.0 / jnp.maximum(mass_r, 1e-12)
    active = (mass_r > 1e-12).astype(gridreg.dtype)
    vreg = jnp.stack(
        [gridreg[:, d] * inv_mass * active for d in range(3)], axis=1
    )
    new_v, new_C = g2p_regions(base, fx, vreg, G, float(G), binning,
                               m=m, interpret=True)
    return new_v, new_C


def _roundtrip_canonical(base, fx, w, usedf, mass, v, affine, G, dx,
                         binning, m):
    grid = p2g_pallas(base, fx, w, usedf, mass, v, affine, G, dx,
                      interpret=True, binning=binning, m=m)
    mass_g = grid[3]
    inv_mass = 1.0 / jnp.maximum(mass_g, 1e-12)
    active = (mass_g > 1e-12).astype(grid.dtype)
    v_out = jnp.stack([grid[d] * inv_mass * active for d in range(3)])
    return g2p_pallas(base, fx, w, v_out, G, float(G), interpret=True,
                      binning=binning, m=m)


@pytest.mark.parametrize("m", [0, 1])
def test_roundtrip_matches(inputs, m):
    base, fx, w, usedf, mass, v, affine, G, dx = inputs
    binning = compute_binning(base, G)
    a_v, a_C = _roundtrip_canonical(base, fx, w, usedf, mass, v, affine,
                                    G, dx, binning, m)
    b_v, b_C = _roundtrip_regions(base, fx, w, usedf, mass, v, affine,
                                  G, dx, binning, m)
    np.testing.assert_allclose(np.asarray(b_v), np.asarray(a_v), atol=1e-4)
    # C reassociates through the batched z-contraction (one stacked dot
    # vs per-channel dots) — worst element ~2e-3 on values of O(10)
    np.testing.assert_allclose(np.asarray(b_C), np.asarray(a_C), atol=4e-3)


@pytest.mark.parametrize("m", [0, 1])
def test_roundtrip_gradients_match(inputs, m):
    base, fx, w, usedf, mass, v, affine, G, dx = inputs
    binning = compute_binning(base, G)

    # differentiate wrt fx too: the regions path's custom VJP boundary
    # sits at fx (derivative-weight marginals), the canonical path
    # chains d_w -> d_fx through quadratic_weights_soa — both must
    # produce the same d_fx.
    def loss(fn, v_, a_, fx_):
        w_ = quadratic_weights_soa(fx_)
        nv, nC = fn(base, fx_, w_, usedf, mass, v_, a_, G, dx, binning, m)
        return jnp.sum(nv * 0.3) + jnp.sum(nC * 0.05)

    g1 = jax.grad(
        lambda v_, a_, fx_: loss(_roundtrip_canonical, v_, a_, fx_),
        argnums=(0, 1, 2),
    )(v, affine, fx)
    g2 = jax.grad(
        lambda v_, a_, fx_: loss(_roundtrip_regions, v_, a_, fx_),
        argnums=(0, 1, 2),
    )(v, affine, fx)
    for a, b in zip(g1, g2):
        np.testing.assert_allclose(
            np.asarray(b), np.asarray(a), atol=2e-3, rtol=5e-3
        )


# ---------------------------------------------------------------- engine

class TestEngineRegions:
    """engine/mpm.py p2g_impl=g2p_impl='regions': full-substep parity
    with the portable scatter/gather reference path."""

    @staticmethod
    def _regions_cfg(cfg, persistent=False):
        import dataclasses

        kw = dict(p2g_impl="regions", g2p_impl="regions")
        if persistent:
            kw.update(binning_mode="step", binning_margin=2)
        return dataclasses.replace(cfg, **kw)

    @pytest.mark.parametrize("persistent", [False, True])
    def test_step_matches_reference(self, persistent):
        from fluidlab_tpu.engine.mpm import make_step
        from fluidlab_tpu.utils.bench_scenes import liquid_block_scene

        cfg, params, state = liquid_block_scene(
            n_particles=2048, horizon=10
        )
        step_ref = make_step(cfg)
        step_reg = make_step(self._regions_cfg(cfg, persistent))
        a = jnp.zeros((1,), jnp.float32)
        ha = jnp.asarray(False)
        sr = sg = state
        for _ in range(3):
            sr = step_ref(sr, params, a, ha)
            sg = step_reg(sg, params, a, ha)
        np.testing.assert_allclose(
            np.asarray(sg.particles.x), np.asarray(sr.particles.x),
            atol=1e-6,
        )
        np.testing.assert_allclose(
            np.asarray(sg.particles.v), np.asarray(sr.particles.v),
            atol=1e-5,
        )

    def test_gradient_matches_reference(self):
        from fluidlab_tpu.engine.mpm import make_step
        from fluidlab_tpu.utils.bench_scenes import liquid_block_scene

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
        gg = make_grad(make_step(self._regions_cfg(cfg)))(
            state.particles.v, state
        )
        gr, gg = np.asarray(gr), np.asarray(gg)
        scale = np.abs(gr).max()
        assert np.abs(gr - gg).max() < 1e-4 * max(scale, 1.0)

    def test_latteart_scene_parity(self):
        """Statics (cup SDF), cylinder boundary, injector agent — the
        region-space grid_op must reproduce the reference path."""
        from fluidlab_tpu.engine.mpm import make_step
        from tests.test_envs_solver import TinyLatteArtEnv

        env_r = TinyLatteArtEnv(loss=False, seed=0)
        env_g = TinyLatteArtEnv(loss=False, seed=0)
        sim_g = env_g.sim
        sim_g.cfg = self._regions_cfg(sim_g.cfg)
        sim_g._step_fn = jax.jit(
            make_step(sim_g.cfg, sim_g._smoke_step_fn)
        )

        rng = np.random.RandomState(1)
        for _ in range(3):
            act = rng.uniform(-0.5, 0.5, env_r.action_space.shape)
            env_r.sim.step(act)
            env_g.sim.step(act)
        ur = np.asarray(env_r.sim.state.particles.used)
        ug = np.asarray(env_g.sim.state.particles.used)
        assert (ur == ug).all()
        assert ur.sum() > 0
        np.testing.assert_allclose(
            np.asarray(env_g.sim.state.particles.x)[:, ur],
            np.asarray(env_r.sim.state.particles.x)[:, ur],
            atol=1e-5,
        )
