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

    def test_rejects_injector_and_regions(self):
        from fluidlab_tpu.engine.mpm import make_substep

        cfg, _, _ = liquid_block_scene(n_particles=1024, horizon=2)
        import dataclasses

        bad = dataclasses.replace(cfg, p2g_impl="regions", g2p_impl="regions")
        with pytest.raises(ValueError, match="spatial|regions"):
            make_substep(bad, psum_axis="space")
