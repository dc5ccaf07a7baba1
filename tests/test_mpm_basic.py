"""End-to-end slice tests: liquid MLS-MPM under gravity + gradient checks.

This is the de-risking slice of SURVEY.md §7 step 2: p2g -> grid_op -> g2p
-> advect for LIQUID, cube boundary, gravity, no agent; differentiate a
toy loss w.r.t. initial velocity and validate against finite differences.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from fluidlab_tpu.config import materials as M
from fluidlab_tpu.engine.config import SimCfg
from fluidlab_tpu.engine.rollout import make_rollout
from fluidlab_tpu.engine.scene import SceneParams, particle_params_from_properties
from fluidlab_tpu.engine.types import ParticleState, SimState


def build_liquid_scene(n=512, seed=0, lower=0.4, upper=0.6, horizon=20):
    cfg = SimCfg(n_particles=n, n_bodies=1, horizon=horizon,
                 gravity=(0.0, -10.0, 0.0))
    rng = np.random.default_rng(seed)
    x = rng.uniform(lower, upper, size=(3, n)).astype(np.float32)
    mat = np.full(n, M.WATER, dtype=np.int32)
    rho = np.full(n, M.RHO[M.WATER], dtype=np.float32)
    body = np.zeros(n, dtype=np.int32)
    params = SceneParams(**particle_params_from_properties(mat, rho, body, cfg))
    F0 = np.zeros((9, n), np.float32)
    F0[[0, 4, 8]] = 1.0
    state = SimState(
        particles=ParticleState(
            x=jnp.asarray(x),
            v=jnp.zeros((3, n), jnp.float32),
            C=jnp.zeros((9, n), jnp.float32),
            F=jnp.asarray(F0),
            used=jnp.ones((n,), bool),
        ),
        effectors=(),
        smoke=None,
        f_global=jnp.zeros((), jnp.int32),
    )
    return cfg, params, state


class TestLiquidFall:
    @pytest.fixture(scope="class")
    def result(self):
        cfg, params, state = build_liquid_scene(n=512, horizon=30)
        rollout = jax.jit(make_rollout(cfg))
        actions = jnp.zeros((30, 1), jnp.float32)
        final, _ = rollout(state, params, actions)
        return cfg, state, final

    def test_no_nans(self, result):
        _, _, final = result
        for leaf in jax.tree_util.tree_leaves(final.particles):
            assert np.all(np.isfinite(np.asarray(leaf, dtype=np.float32)))

    def test_falls_under_gravity(self, result):
        _, state0, final = result
        y0 = float(jnp.mean(state0.particles.x[1]))
        y1 = float(jnp.mean(final.particles.x[1]))
        # 30 steps = 60 ms of free fall at g=10 -> drop ~1.8 cm before
        # contact; must have dropped measurably
        assert y1 < y0 - 0.01

    def test_stays_in_boundary(self, result):
        cfg, _, final = result
        x = np.asarray(final.particles.x)
        assert x.min() >= 0.05 - 1e-5
        assert x.max() <= 0.95 + 1e-5

    def test_f_global_advances(self, result):
        cfg, _, final = result
        assert int(final.f_global) == 30 * cfg.n_substeps

    def test_liquid_F_is_isotropic(self, result):
        # liquid F is reset to J^(1/3) I every substep (reference :358-359)
        _, _, final = result
        F = np.asarray(final.particles.F)  # (9, N) row-major
        assert np.abs(F[1]).max() < 1e-6  # off-diagonal
        assert np.abs(F[0] - F[4]).max() < 1e-6  # isotropic diagonal


class TestGradients:
    def test_grad_matches_finite_difference(self):
        """d(mean final height)/d(initial v_y) vs central differences."""
        cfg, params, state = build_liquid_scene(n=64, horizon=5)
        rollout = make_rollout(cfg)
        actions = jnp.zeros((5, 1), jnp.float32)

        def loss(vy):
            st = state.replace(
                particles=state.particles.replace(
                    v=state.particles.v.at[1].set(vy)
                )
            )
            final, _ = rollout(st, params, actions)
            return jnp.mean(final.particles.x[1])

        loss_j = jax.jit(loss)
        g = float(jax.jit(jax.grad(loss))(jnp.float32(0.0)))
        eps = 1e-3
        fd = (float(loss_j(jnp.float32(eps))) - float(loss_j(jnp.float32(-eps)))) / (
            2 * eps
        )
        # analytic ballpark: dy/dvy ~ n_steps * n_substeps * dt = 0.01 s
        assert 0.001 < g < 0.02
        np.testing.assert_allclose(g, fd, rtol=0.05, atol=1e-4)

    def test_grad_through_checkpointed_windows(self):
        """Windowed remat must not change values or gradients."""
        cfg, params, state = build_liquid_scene(n=64, horizon=8)
        actions = jnp.zeros((8, 1), jnp.float32)

        def make_loss(window):
            rollout = make_rollout(cfg, window=window)

            def loss(vy):
                st = state.replace(
                    particles=state.particles.replace(
                        v=state.particles.v.at[1].set(vy)
                    )
                )
                final, _ = rollout(st, params, actions)
                return jnp.mean(final.particles.x[1])

            return loss

        g_plain = float(jax.jit(jax.grad(make_loss(None)))(jnp.float32(0.01)))
        g_win = float(jax.jit(jax.grad(make_loss(4)))(jnp.float32(0.01)))
        np.testing.assert_allclose(g_plain, g_win, rtol=1e-4, atol=1e-7)


class TestStateCheckpoint:
    def test_save_load_roundtrip(self, tmp_path):
        from fluidlab_tpu.utils.checkpoint import load_state, save_state

        cfg, params, state = build_liquid_scene(n=64, horizon=5)
        rollout = jax.jit(make_rollout(cfg))
        mid, _ = rollout(state, params, jnp.zeros((3, 1), jnp.float32))

        path = str(tmp_path / "state.npz")
        save_state(path, mid)
        restored = load_state(path, mid)

        # identical continuation from the restored state
        f1, _ = rollout(mid, params, jnp.zeros((2, 1), jnp.float32))
        f2, _ = rollout(restored, params, jnp.zeros((2, 1), jnp.float32))
        np.testing.assert_array_equal(
            np.asarray(f1.particles.x), np.asarray(f2.particles.x)
        )


class TestInviscidLiquidSpecialization:
    """cfg.all_inviscid_liquid=True (static scene fact: every particle
    mu=0 liquid) skips the SVD at trace time; it must match the general
    path to rounding over a multi-step rollout, fwd and grad."""

    def test_matches_general_path(self):
        import dataclasses

        from fluidlab_tpu.engine.mpm import make_step
        from fluidlab_tpu.utils.bench_scenes import liquid_block_scene

        cfg, params, state = liquid_block_scene(n_particles=1024, horizon=5)
        assert cfg.all_inviscid_liquid
        cfg_ref = dataclasses.replace(cfg, all_inviscid_liquid=False)
        act = jnp.zeros((1,), jnp.float32)
        ha = jnp.asarray(False)
        sf = jax.jit(lambda s: make_step(cfg)(s, params, act, ha))
        sr = jax.jit(lambda s: make_step(cfg_ref)(s, params, act, ha))
        a = b = state
        for _ in range(3):
            a, b = sf(a), sr(b)
        np.testing.assert_allclose(a.particles.x, b.particles.x, atol=1e-6)
        np.testing.assert_allclose(a.particles.v, b.particles.v, atol=1e-4)
        np.testing.assert_allclose(a.particles.F, b.particles.F, atol=1e-5)

        def loss(c, v0):
            st = state.replace(particles=state.particles.replace(v=v0))
            step = make_step(c)
            st = step(st, params, act, ha)
            return jnp.sum(st.particles.x[1])

        gf = jax.jit(jax.grad(lambda v: loss(cfg, v)))(state.particles.v)
        gr = jax.jit(jax.grad(lambda v: loss(cfg_ref, v)))(state.particles.v)
        np.testing.assert_allclose(gf, gr, rtol=1e-4, atol=1e-8)

    def test_elide_variants_match(self):
        """The bisection variants ('ftmp': keep F_tmp, direct det;
        'sphvjp': closed-form custom VJP around the det/cbrt chain) must
        match the default spherical-F shortcut, fwd and grad."""
        import dataclasses

        from fluidlab_tpu.engine.mpm import make_step
        from fluidlab_tpu.utils.bench_scenes import liquid_block_scene

        cfg, params, state = liquid_block_scene(n_particles=512, horizon=3)
        act = jnp.zeros((1,), jnp.float32)
        ha = jnp.asarray(False)

        def run(variant):
            c = dataclasses.replace(cfg, elide_variant=variant)
            step = make_step(c)

            def loss(v0):
                st = state.replace(particles=state.particles.replace(v=v0))
                for _ in range(3):
                    st = step(st, params, act, ha)
                return jnp.sum(st.particles.x[1] ** 2), st

            (val, st), g = jax.jit(
                jax.value_and_grad(loss, has_aux=True)
            )(state.particles.v)
            return val, st, g

        v0, s0, g0 = run("sph")
        for variant in ("ftmp", "sphvjp"):
            v1, s1, g1 = run(variant)
            np.testing.assert_allclose(v1, v0, rtol=1e-6)
            np.testing.assert_allclose(
                s1.particles.x, s0.particles.x, atol=1e-6
            )
            np.testing.assert_allclose(g1, g0, rtol=1e-4, atol=1e-8)
