"""Circulation env (smoke-only task) integration test at reduced smoke
resolution."""

import numpy as np
import pytest

from fluidlab_tpu.envs.tasks import CirculationEnv


class TinyCirculationEnv(CirculationEnv):
    horizon = 6
    horizon_action = 6
    smoke_res = 32
    smoke_solver_iters = 10

    def setup_statics(self):
        pass  # skip the room SDF at test scale

    def setup_renderer(self):
        self.sim.renderer = None


class TestCirculation:
    @pytest.fixture(scope="class")
    def env(self):
        return TinyCirculationEnv(loss=True, seed=0)

    def test_build(self, env):
        assert env.sim.cfg.smoke is not None
        assert env.sim.cfg.smoke.res == 32
        assert env.sim.action_dim == 8

    def test_aircon_moves_smoke(self, env):
        env.reset()
        # strong fan: dims 6 (strength) and 7 (radius), scales 1e5 and 50
        a = np.zeros(8, np.float32)
        a[6] = 0.05
        a[7] = 0.05
        q0 = np.asarray(env.sim.state.smoke.q).copy()
        for _ in range(3):
            env.sim.step(a)
        v = np.asarray(env.sim.state.smoke.v)
        assert np.abs(v).max() > 1e-4
        q1 = np.asarray(env.sim.state.smoke.q)
        assert not np.allclose(q0, q1)

    def test_loss_and_reward(self, env):
        env.reset()
        a = np.zeros(8, np.float32)
        a[6] = 0.05
        a[7] = 0.05
        obs, reward, done, info = env.step(a)
        assert np.isfinite(reward)
        # step_loss = sum of |q - target| at 15 detectors; bounded by 15
        loss = env.sim.get_step_loss()["loss"]
        assert 0 <= loss <= 15.0

    def test_rollout_grad_wrt_action(self, env):
        import jax
        import jax.numpy as jnp

        rollout = env.sim.make_rollout_fn()
        aux = env.sim.loss.loss_aux()
        H, A = env.horizon, 8
        mask = jnp.ones((H,), bool)

        def total(actions):
            _, out = rollout(
                env.sim.init_state, env.sim.params, actions, mask, None, aux
            )
            return jnp.sum(out["step_loss"])

        a = jnp.zeros((H, A), jnp.float32).at[:, 6].set(0.05).at[:, 7].set(0.05)
        g = jax.jit(jax.grad(total))(a)
        g = np.asarray(g)
        assert np.isfinite(g).all()
        # the aircon strength/radius dims must receive gradient
        assert np.abs(g[:, 6:8]).max() > 0
