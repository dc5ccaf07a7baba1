"""Canonical benchmark scenes (shared by bench.py, __graft_entry__.py,
perf tests)."""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from fluidlab_tpu.config import materials as M
from fluidlab_tpu.engine.config import SimCfg
from fluidlab_tpu.engine.scene import SceneParams, particle_params_from_properties
from fluidlab_tpu.engine.types import ParticleState, SimState
from fluidlab_tpu.losses.base import Loss


def liquid_block_scene(n_particles=65536, horizon=10, seed=0,
                       gravity=(0.0, -10.0, 0.0)):
    """Water block in the unit box — the LatteArt-scale physics core
    without scene assets (64^3 grid, ~64k particles, 10 substeps/step)."""
    cfg = SimCfg(n_particles=n_particles, n_bodies=1, horizon=horizon,
                 gravity=gravity,
                 all_inviscid_liquid=True)  # water: mu=0 liquid
    rng = np.random.default_rng(seed)
    x = rng.uniform(0.2, 0.8, size=(3, n_particles)).astype(np.float32)
    x[1] = rng.uniform(0.3, 0.7, size=n_particles)
    mat = np.full(n_particles, M.WATER, dtype=np.int32)
    rho = np.full(n_particles, M.RHO[M.WATER], dtype=np.float32)
    body = np.zeros(n_particles, dtype=np.int32)
    params = SceneParams(**particle_params_from_properties(mat, rho, body, cfg))
    state = SimState(
        particles=ParticleState(
            x=jnp.asarray(x),
            v=jnp.zeros((3, n_particles), jnp.float32),
            C=jnp.zeros((9, n_particles), jnp.float32),
            F=jnp.asarray(_eye9(n_particles)),
            used=jnp.ones((n_particles,), bool),
        ),
        effectors=(),
        smoke=None,
        f_global=jnp.zeros((), jnp.int32),
    )
    return cfg, params, state


def _eye9(n):
    F0 = np.zeros((9, n), np.float32)
    F0[[0, 4, 8]] = 1.0
    return F0


class MeanHeightLoss(Loss):
    """Trivial differentiable objective for harness scenes: mean particle
    height (drives a gradient through the whole rollout)."""

    def loss_fn(self, state, params, aux_t):
        return {"step_loss": jnp.mean(state.particles.x[1])}


class _BenchSim:
    """Minimal FluidSim-like shim for MultiStartPlanner over a manual
    scene (no asset loading)."""

    def __init__(self, cfg, params, state, loss=None, window=None):
        from fluidlab_tpu.engine.rollout import make_rollout

        self.cfg = cfg
        self.params = params
        self.init_state = state
        self.loss = loss
        self.window = window
        self._smoke_step_fn = None

    def make_rollout_fn(self, with_loss=True, action_overlay=None, window=None):
        from fluidlab_tpu.engine.rollout import make_rollout

        loss_fn = self.loss.loss_fn if (with_loss and self.loss) else None
        return make_rollout(
            self.cfg, loss_fn=loss_fn, smoke_step_fn=self._smoke_step_fn,
            window=self.window if window is None else window,
            action_overlay=action_overlay,
        )


def liquid_agent_scene(n_particles=4096, horizon=4, seed=0):
    """Tiny liquid scene with a rigid-effector agent — exercises the
    action-conditioned path for planner dry runs."""
    from fluidlab_tpu.engine.boundaries import CubeBoundary
    from fluidlab_tpu.engine.config import AgentCfg, EffectorCfg
    from fluidlab_tpu.engine.types import init_effector_state

    eff = EffectorCfg(
        kind="rigid",
        action_dim=3,
        boundary=CubeBoundary(),
        init_pos=(0.35, 0.5, 0.5),
    )
    agent = AgentCfg(effectors=(eff,), collide_type=None)
    cfg = SimCfg(n_particles=n_particles, n_bodies=1, horizon=horizon,
                 agent=agent)
    rng = np.random.default_rng(seed)
    x = rng.uniform(0.4, 0.6, size=(3, n_particles)).astype(np.float32)
    mat = np.full(n_particles, M.WATER, dtype=np.int32)
    rho = np.full(n_particles, 1.0, dtype=np.float32)
    body = np.zeros(n_particles, dtype=np.int32)
    params = SceneParams(
        colliders=(None,),
        inj_rand=(None,),
        inj_act_range=(None,),
        **particle_params_from_properties(mat, rho, body, cfg),
    )
    state = SimState(
        particles=ParticleState(
            x=jnp.asarray(x),
            v=jnp.zeros((3, n_particles), jnp.float32),
            C=jnp.zeros((9, n_particles), jnp.float32),
            F=jnp.asarray(_eye9(n_particles)),
            used=jnp.ones((n_particles,), bool),
        ),
        effectors=(init_effector_state((0.35, 0.5, 0.5), (1, 0, 0, 0)),),
        smoke=None,
        f_global=jnp.zeros((), jnp.int32),
    )
    loss = MeanHeightLoss(max_loss_steps=horizon)
    sim = _BenchSim(cfg, params, state, loss=loss, window=None)
    loss.sim = sim
    return sim
