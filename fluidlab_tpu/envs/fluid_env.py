"""Gym-compatible base env (reference fluidlab/envs/fluid_env.py:9-158).

Observations: subsampled per-body particle x/v/used + effector states +
strided smoke slab (reference _get_obs, fluid_env.py:99-125).  Reward from
the task loss's per-step affine map (reference _get_reward, :127-129).
"""

from __future__ import annotations

import gymnasium as gym
import numpy as np
from gymnasium.spaces import Box

from fluidlab_tpu.engine.sim import FluidSim
from fluidlab_tpu.utils.misc import set_random_seed


class FluidEnv(gym.Env):
    # subclass knobs (reference per-env __init__ fields)
    horizon = 500
    horizon_action = 500
    target_file = None
    _n_obs_ptcls_per_body = 200
    action_range = np.array([-1.0, 1.0])
    particle_density = 1e6
    max_substeps_local = 50
    gravity = (0.0, -10.0, 0.0)

    pool_scale = 1.0  # scales 'nowhere' pools (debug scale-down)
    transfer = "auto"  # particle-grid transfer impl (engine/sim.py)

    def __init__(self, loss=True, loss_type="diff", seed=None,
                 renderer_type="point", particle_density=None,
                 pool_scale=None):
        if seed is not None:
            self.seed(seed)
        self.loss = loss
        self.loss_type = loss_type
        self.renderer_type = renderer_type
        if particle_density is not None:
            self.particle_density = particle_density
            # keep pools proportional to density unless explicitly set
            if pool_scale is None:
                pool_scale = particle_density / 1e6
        if pool_scale is not None:
            self.pool_scale = pool_scale

        self.sim = FluidSim(
            dim=3,
            particle_density=self.particle_density,
            max_substeps_local=self.max_substeps_local,
            gravity=self.gravity,
            horizon=self.horizon,
            transfer=self.transfer,
        )
        self.build_env()
        self.gym_misc()

    # alias for reference-API familiarity (TaichiEnv attribute)
    @property
    def taichi_env(self):
        return self.sim

    @property
    def agent(self):
        return self.sim.cfg.agent

    def seed(self, seed):
        set_random_seed(seed)

    # ----------------------------------------------------------- scene hooks
    def build_env(self):
        self.setup_agent()
        self.setup_statics()
        self.setup_bodies()
        self.setup_smoke_field()
        self.setup_boundary()
        self.setup_renderer()
        if self.loss:
            self.setup_loss()
        self.sim.build()
        self._init_state = self.sim.get_state()

    def setup_agent(self):
        pass

    def setup_statics(self):
        pass

    def setup_bodies(self):
        pass

    def setup_smoke_field(self):
        pass

    def setup_boundary(self):
        pass

    def setup_renderer(self):
        self.sim.setup_renderer(kind=self.renderer_type)

    def setup_loss(self):
        pass

    # ------------------------------------------------------------- gym glue
    def gym_misc(self):
        obs = self.reset()
        self.observation_space = Box(
            -np.inf, np.inf, obs.shape, dtype=np.float32
        )
        if self.sim.action_dim > 0:
            self.action_space = Box(
                np.float32(self.action_range[0]),
                np.float32(self.action_range[1]),
                (self.sim.action_dim,),
                dtype=np.float32,
            )
        else:
            self.action_space = None

    def reset(self, *, seed=None, options=None):
        self.sim.set_state(self._init_state["state"])
        return self._get_obs()

    def _get_obs(self):
        state = self.sim.state
        obs = []
        if state.particles is not None and self.sim.particles is not None:
            x = np.asarray(state.particles.x).T  # (N, 3)
            v = np.asarray(state.particles.v).T
            used = np.asarray(state.particles.used)
            for body_id in range(self.sim.particles["bodies"]["n"]):
                ids = self.sim.particles["bodies"]["particle_ids"][body_id]
                n_body = self.sim.particles["bodies"]["n_particles"][body_id]
                step = max(1, n_body // self._n_obs_ptcls_per_body)
                sel = ids[::step]
                obs += [x[sel].ravel(), v[sel].ravel(),
                        used[sel].astype(np.float32)]
        for eff in state.effectors:
            obs += [np.asarray(eff.pos), np.asarray(eff.quat)]
        if state.smoke is not None:
            obs += [
                np.asarray(state.smoke.v)[:, ::10, 60:68, ::10].ravel(),
                np.asarray(state.smoke.q)[:, ::10, 60:68, ::10].ravel(),
            ]
        return np.concatenate([np.asarray(o, np.float32).ravel() for o in obs])

    def _get_reward(self):
        return self.sim.get_step_loss()["reward"]

    def step(self, action):
        action = np.clip(
            np.asarray(action, np.float32),
            self.action_range[0],
            self.action_range[1],
        )
        self.sim.step(action)
        obs = self._get_obs()
        reward = self._get_reward()
        assert self.t <= self.horizon
        done = self.t == self.horizon
        if np.isnan(reward):
            reward = -1000.0
            done = True
        return obs, reward, done, {}

    def render(self, mode="human"):
        frame = self.sim.render("rgb_array")
        if mode == "human":
            # interactive window when a display exists (reference
            # GGUIRenderer human mode); headless falls through to the
            # returned rgb_array.
            from fluidlab_tpu.render.viewer import (
                InteractiveViewer,
                display_available,
            )

            if display_available() and getattr(self, "_viewer", None) is not False:
                try:
                    if getattr(self, "_viewer", None) is None:
                        self._viewer = InteractiveViewer(
                            self.sim.renderer, self.sim
                        )
                    self._viewer.draw(frame)
                except Exception:
                    # missing GUI backend etc. — degrade to rgb_array;
                    # False = don't retry construction every frame
                    self._viewer = False
        return frame

    @property
    def t(self):
        return self.sim.t

    # ----------------------------------------------------- policy factories
    def demo_policy(self, user_input=False):
        raise NotImplementedError

    def trainable_policy(self, optim_cfg, init_range):
        from fluidlab_tpu.optimizer.policies import TrainablePolicy

        return TrainablePolicy(
            optim_cfg, init_range, self.sim.action_dim, self.horizon_action,
            self.action_range,
        )
