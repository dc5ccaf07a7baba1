"""Spatial particle-sharding tests on the virtual 8-device CPU mesh
(SURVEY.md §4: shard_map collectives exercised in CI without hardware).

Sharded forward/backward must match the single-device path to float
tolerance: the only cross-device ops are the grid psum and the rigid
shape-matching moment psum (parallel/spatial.py), which are exact
reorderings of the unsharded sums up to f32 association.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from fluidlab_tpu.config import materials as M
from fluidlab_tpu.engine.config import SimCfg
from fluidlab_tpu.engine.mpm import make_step
from fluidlab_tpu.engine.scene import SceneParams, particle_params_from_properties
from fluidlab_tpu.engine.types import ParticleState, SimState
from fluidlab_tpu.parallel.spatial import (
    make_space_mesh,
    make_spatial_rollout,
    make_spatial_step,
)
from fluidlab_tpu.utils.bench_scenes import liquid_agent_scene, liquid_block_scene

pytestmark = pytest.mark.skipif(
    len(jax.devices()) < 8, reason="needs 8 virtual devices"
)


def _run_steps(step, state, params, action, n):
    for _ in range(n):
        state = step(state, params, action, jnp.asarray(True))
    return state


def _assert_state_close(a, b, atol=1e-5):
    np.testing.assert_allclose(a.particles.x, b.particles.x, atol=atol)
    np.testing.assert_allclose(a.particles.v, b.particles.v, atol=atol)
    np.testing.assert_allclose(a.particles.C, b.particles.C, atol=2e-4)
    np.testing.assert_allclose(a.particles.F, b.particles.F, atol=atol)
    np.testing.assert_array_equal(a.particles.used, b.particles.used)


def rigid_mixed_scene(n_particles=1024, horizon=2):
    """Half water, half a rigid cube body — exercises the sharded
    shape-matching moment reduction and the SVD/material branches."""
    cfg = SimCfg(n_particles=n_particles, n_bodies=2, horizon=horizon,
                 has_rigid_bodies=True)
    rng = np.random.default_rng(3)
    n_w = n_particles // 2
    x = np.empty((3, n_particles), np.float32)
    x[:, :n_w] = rng.uniform(0.3, 0.7, size=(3, n_w))
    x[:, n_w:] = rng.uniform(0.45, 0.55, size=(3, n_particles - n_w))
    mat = np.full(n_particles, M.WATER, np.int32)
    mat[n_w:] = M.RIGID
    rho = np.ones(n_particles, np.float32)
    body = np.zeros(n_particles, np.int32)
    body[n_w:] = 1
    params = SceneParams(**particle_params_from_properties(mat, rho, body, cfg))
    F0 = np.zeros((9, n_particles), np.float32)
    F0[[0, 4, 8]] = 1.0
    state = SimState(
        particles=ParticleState(
            x=jnp.asarray(x), v=jnp.zeros((3, n_particles), jnp.float32),
            C=jnp.zeros((9, n_particles), jnp.float32), F=jnp.asarray(F0),
            used=jnp.ones((n_particles,), bool),
        ),
        effectors=(), smoke=None, f_global=jnp.zeros((), jnp.int32),
    )
    return cfg, params, state


def ball_injector_scene(n_particles=1024):
    """Liquid on even pool slots; odd slots form the injection pool —
    every device's shard holds both, so sharded injection must route
    each firing to the right owner."""
    from fluidlab_tpu.engine.boundaries import CubeBoundary
    from fluidlab_tpu.engine.config import AgentCfg, EffectorCfg
    from fluidlab_tpu.engine.types import init_effector_state

    flux = 4
    eff = EffectorCfg(
        kind="ball_injector", action_dim=3, boundary=CubeBoundary(),
        init_pos=(0.5, 0.8, 0.5), flux=flux, radius=0.03,
        inject_v=(0.0, -0.3, 0.0),
    )
    agent = AgentCfg(effectors=(eff,), collide_type=None)
    cfg = SimCfg(n_particles=n_particles, n_bodies=1, horizon=4, agent=agent)
    rng = np.random.default_rng(7)
    x = rng.uniform(0.35, 0.65, size=(3, n_particles)).astype(np.float32)
    used = np.zeros(n_particles, bool)
    used[0::2] = True
    x[:, ~used] = M.NOWHERE[0] if hasattr(M, "NOWHERE") else 100.0
    mat = np.full(n_particles, M.WATER, np.int32)
    rho = np.ones(n_particles, np.float32)
    body = np.zeros(n_particles, np.int32)
    L = cfg.horizon * cfg.n_substeps
    ball = rng.uniform(-1.0, 1.0, size=(L * flux * 4, 3))
    ball = ball[np.linalg.norm(ball, axis=1) <= 1.0][: L * flux] * 0.03
    act_range = np.arange(1, n_particles, 2, dtype=np.int32)
    params = SceneParams(
        colliders=(None,),
        inj_rand=(jnp.asarray(ball.reshape(L, flux, 3).astype(np.float32)),),
        inj_act_range=(jnp.asarray(act_range),),
        **particle_params_from_properties(mat, rho, body, cfg),
    )
    F0 = np.zeros((9, n_particles), np.float32)
    F0[[0, 4, 8]] = 1.0
    state = SimState(
        particles=ParticleState(
            x=jnp.asarray(x), v=jnp.zeros((3, n_particles), jnp.float32),
            C=jnp.zeros((9, n_particles), jnp.float32), F=jnp.asarray(F0),
            used=jnp.asarray(used),
        ),
        effectors=(init_effector_state((0.5, 0.8, 0.5), (1, 0, 0, 0)),),
        smoke=None, f_global=jnp.zeros((), jnp.int32),
    )
    return cfg, params, state


class TestSpatialSharding:
    def test_forward_matches_unsharded_liquid(self):
        cfg, params, state = liquid_block_scene(n_particles=1024, horizon=2)
        mesh = make_space_mesh(8)
        action = jnp.zeros((1,), jnp.float32)
        sh = _run_steps(
            make_spatial_step(cfg, mesh, state, params), state, params,
            action, 2,
        )
        ref = _run_steps(
            jax.jit(make_step(cfg)), state, params, action, 2
        )
        _assert_state_close(sh, ref)

    def test_forward_matches_unsharded_rigid(self):
        cfg, params, state = rigid_mixed_scene(n_particles=1024)
        mesh = make_space_mesh(8)
        action = jnp.zeros((1,), jnp.float32)
        sh = _run_steps(
            make_spatial_step(cfg, mesh, state, params), state, params,
            action, 2,
        )
        ref = _run_steps(jax.jit(make_step(cfg)), state, params, action, 2)
        _assert_state_close(sh, ref)

    def test_forward_matches_unsharded_agent(self):
        sim = liquid_agent_scene(n_particles=1024, horizon=2)
        cfg, params, state = sim.cfg, sim.params, sim.init_state
        mesh = make_space_mesh(8)
        action = jnp.asarray([0.02, -0.01, 0.01], jnp.float32)
        sh = _run_steps(
            make_spatial_step(cfg, mesh, state, params), state, params,
            action, 2,
        )
        ref = _run_steps(jax.jit(make_step(cfg)), state, params, action, 2)
        _assert_state_close(sh, ref)
        np.testing.assert_allclose(
            sh.effectors[0].pos, ref.effectors[0].pos, atol=1e-6
        )

    def test_gradient_matches_unsharded(self):
        cfg, params, state = liquid_block_scene(n_particles=1024, horizon=2)
        mesh = make_space_mesh(8)
        H = 2
        actions = jnp.zeros((H, 1), jnp.float32)

        def per_particle_loss(s, p):
            return s.particles.x[1] ** 2

        ro_sh = make_spatial_rollout(
            cfg, mesh, state, params, per_particle_loss
        )

        step = make_step(cfg)

        def f_ref(v0):
            st = state.replace(particles=state.particles.replace(v=v0))

            def body(s, a):
                s = step(s, params, a, jnp.asarray(True))
                return s, jnp.sum(s.particles.x[1] ** 2)

            _, losses = jax.lax.scan(body, st, actions)
            return jnp.sum(losses)

        def f_sh(v0):
            st = state.replace(particles=state.particles.replace(v=v0))
            return ro_sh(st, params, actions)[1]

        v0 = state.particles.v
        l_sh = f_sh(v0)
        l_ref = jax.jit(f_ref)(v0)
        np.testing.assert_allclose(l_sh, l_ref, rtol=1e-5)
        g_sh = jax.jit(jax.grad(f_sh))(v0)
        g_ref = jax.jit(jax.grad(f_ref))(v0)
        np.testing.assert_allclose(g_sh, g_ref, rtol=2e-4, atol=1e-7)

    def test_forward_matches_unsharded_regions(self):
        """The flagship fused regions grid phase under particle sharding:
        one accumulator psum per substep (ops/regions_pallas.py).
        2-device mesh + trimmed substeps: interpret-mode pallas services
        its per-program callbacks from the host thread pool (4 vCPUs
        here) — with >=4 replicas all pool threads block inside the
        replica programs and the callbacks starve (measured: 65-program
        kernel 1.15 s on 2 virtual devices, WEDGED at 4+).  Two shards
        still exercise the accumulator psum + cotangent all-reduce."""
        import dataclasses

        cfg, params, state = liquid_block_scene(n_particles=1024, horizon=2)
        cfg = dataclasses.replace(cfg, p2g_impl="regions", g2p_impl="regions",
                                  n_substeps=2)
        mesh = make_space_mesh(2)
        action = jnp.zeros((1,), jnp.float32)
        sh = _run_steps(
            make_spatial_step(cfg, mesh, state, params), state, params,
            action, 1,
        )
        ref = _run_steps(jax.jit(make_step(cfg)), state, params, action, 1)
        _assert_state_close(sh, ref)

    def test_gradient_matches_unsharded_regions(self):
        # 2-device mesh: see test_forward_matches_unsharded_regions
        import dataclasses

        cfg, params, state = liquid_block_scene(n_particles=1024, horizon=2)
        cfg = dataclasses.replace(cfg, p2g_impl="regions", g2p_impl="regions",
                                  n_substeps=2)
        mesh = make_space_mesh(2)
        H = 1
        actions = jnp.zeros((H, 1), jnp.float32)

        def per_particle_loss(s, p):
            return s.particles.x[1] ** 2

        ro_sh = make_spatial_rollout(
            cfg, mesh, state, params, per_particle_loss
        )
        step = make_step(cfg)

        def f_ref(v0):
            st = state.replace(particles=state.particles.replace(v=v0))

            def body(s, a):
                s = step(s, params, a, jnp.asarray(True))
                return s, jnp.sum(s.particles.x[1] ** 2)

            _, losses = jax.lax.scan(body, st, actions)
            return jnp.sum(losses)

        def f_sh(v0):
            st = state.replace(particles=state.particles.replace(v=v0))
            return ro_sh(st, params, actions)[1]

        v0 = state.particles.v
        np.testing.assert_allclose(f_sh(v0), jax.jit(f_ref)(v0), rtol=1e-5)
        g_sh = jax.jit(jax.grad(f_sh))(v0)
        g_ref = jax.jit(jax.grad(f_ref))(v0)
        np.testing.assert_allclose(g_sh, g_ref, rtol=2e-4, atol=1e-7)

    def test_forward_matches_unsharded_injector(self):
        """Ball-injector agent sharded: global-slot dense injection must
        land each firing on the owning device only."""
        cfg, params, state = ball_injector_scene(n_particles=1024)
        mesh = make_space_mesh(8)
        action = jnp.asarray([0.0, 0.0, 0.0], jnp.float32)
        sh = _run_steps(
            make_spatial_step(cfg, mesh, state, params), state, params,
            action, 3,
        )
        ref = _run_steps(jax.jit(make_step(cfg)), state, params, action, 3)
        used_ref = np.asarray(ref.particles.used)
        used_sh = np.asarray(sh.particles.used)
        np.testing.assert_array_equal(used_sh, used_ref)
        # 3 steps x n_substeps firings x flux new particles
        assert used_ref.sum() == 512 + 3 * cfg.n_substeps * 4
        np.testing.assert_allclose(
            np.asarray(sh.particles.x)[:, used_ref],
            np.asarray(ref.particles.x)[:, used_ref], atol=1e-5,
        )
        np.testing.assert_array_equal(
            np.asarray(sh.effectors[0].act_id), np.asarray(ref.effectors[0].act_id)
        )

    def test_rejects_unshardable_modes(self):
        import dataclasses

        from fluidlab_tpu.engine.mpm import make_substep

        cfg, _, _ = liquid_block_scene(n_particles=1024, horizon=2)
        bad = dataclasses.replace(cfg, binning_mode="step")
        with pytest.raises(ValueError, match="binning_mode"):
            make_substep(bad, psum_axis="space")
