"""IceCreamDynamic env: ball injector + inject_till gate + action routing
to the rigid cone (unique agent code paths)."""

import numpy as np
import pytest

from fluidlab_tpu.envs.tasks import IceCreamDynamicEnv


class TinyIceCreamEnv(IceCreamDynamicEnv):
    horizon = 8
    horizon_action = 8
    pool_scale = 0.01  # 1000-particle pool

    def __init__(self, **kwargs):
        kwargs.setdefault("particle_density", 2e4)
        kwargs.setdefault("loss", False)
        super().__init__(**kwargs)

    def setup_statics(self):
        pass  # dispenser is visual-only anyway

    def setup_renderer(self):
        self.sim.renderer = None


class TestIceCreamDynamic:
    @pytest.fixture(scope="class")
    def env(self):
        return TinyIceCreamEnv(seed=0)

    def test_agent_structure(self, env):
        agent = env.sim.cfg.agent
        assert len(agent.effectors) == 2
        assert agent.effectors[0].kind == "ball_injector"
        assert agent.effectors[1].kind == "rigid"
        assert agent.inject_till == 7700
        assert agent.collide_y_gate == 0.25
        # action routes only to the rigid cone (reference
        # agent_icecreamdynamic.py:54-64)
        assert env.sim.action_dim == 3

    def test_ball_injection(self, env):
        env.reset()
        for _ in range(3):
            env.sim.step(np.zeros(3, np.float32))
        used = np.asarray(env.sim.state.particles.used)
        # flux=10/substep, 30 substeps
        assert used.sum() == 300
        x = np.asarray(env.sim.state.particles.x).T[used]
        # injected within radius 0.035 of the injector (0.5, 0.8, 0.5),
        # plus a little fall
        d = np.linalg.norm(x - np.array([0.5, 0.8, 0.5]), axis=1)
        assert d.max() < 0.08

    def test_action_moves_cone_only(self, env):
        env.reset()
        env.sim.step(np.array([0.004, 0.0, 0.0], np.float32))
        injector_pos = np.asarray(env.sim.state.effectors[0].pos)
        cone_pos = np.asarray(env.sim.state.effectors[1].pos)
        np.testing.assert_allclose(injector_pos, [0.5, 0.8, 0.5], atol=1e-6)
        assert cone_pos[0] > 0.5  # cone moved +x

    def test_action_clipped(self, env):
        # reference clips actions to +-1 (agent_icecreamdynamic.py:56-58)
        env.reset()
        env.sim.step(np.array([5.0, 0.0, 0.0], np.float32))
        cone_pos = np.asarray(env.sim.state.effectors[1].pos)
        # clip(5) = 1, scale 1, /10 substeps, 10 substeps -> moved ~1... but
        # boundary clamps to 0.95
        assert cone_pos[0] <= 0.95 + 1e-6
