"""Per-task differentiable losses.

Each class mirrors a reference loss (fluidlab/fluidengine/losses/*.py);
file:line citations on each class.  The device side is a pure ``loss_fn``;
curriculum/reward bookkeeping is inherited from :class:`Loss`.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from fluidlab_tpu.config import materials as M
from fluidlab_tpu.losses.base import Loss
from fluidlab_tpu.losses.shapematching import ShapeMatchingLoss


class LatteArtLoss(ShapeMatchingLoss):
    """reference latteart_loss.py:14-45 — MILK shape-matching, range 'all',
    reward 0.025*(121.3 - step_loss)."""

    reward_scale = 0.025
    reward_offset = 121.3
    step_loss_scale = 0.025

    def __init__(self, type="diff", **kwargs):
        super().__init__(
            matching_mat=M.MILK, temporal_range_type="all", **kwargs
        )


class LatteArtStirLoss(ShapeMatchingLoss):
    """reference latteartstir_loss.py:14-101 — shape matching over ALL
    particles + separate milk-only metric."""

    reward_scale = 0.002
    reward_offset = 1000.0
    step_loss_scale = 0.002

    def __init__(self, type="diff", **kwargs):
        if type == "diff":
            super().__init__(
                matching_mat=M.MILK_VIS,
                temporal_init_range_end=50,
                temporal_range_type="expand",
                plateau_count_limit=5,
                temporal_expand_speed=10,
                plateau_thresh=(0.01, 0.1),
                **kwargs,
            )
        else:
            super().__init__(
                matching_mat=M.MILK_VIS, temporal_range_type="all", **kwargs
            )

    def loss_fn(self, state, params, aux_t):
        x = state.particles.x  # (3, N)
        used = state.particles.used
        d2 = jnp.sum((x - aux_t) ** 2, axis=0)
        chamfer_all = jnp.sum(jnp.where(used, d2, 0.0))
        milk = used & (params.p_mat == self.matching_mat)
        chamfer_milk = jnp.sum(jnp.where(milk, d2, 0.0))
        return {
            "step_loss": chamfer_all * self.chamfer_weight,
            "step_loss_milk": chamfer_milk * self.chamfer_weight,
        }

    def get_final_loss_info(self, step_losses, extras=None):
        info = super().get_final_loss_info(step_losses)
        if extras is not None and "step_loss_milk" in extras:
            info["loss_milk"] = float(np.sum(extras["step_loss_milk"]))
        return info


class IceCreamStaticLoss(ShapeMatchingLoss):
    """reference icecreamstatic_loss.py:14-73 — ICECREAM1 shape matching,
    expand curriculum from 100, reward 0.001*(900 - step)."""

    reward_scale = 0.001
    reward_offset = 900.0
    step_loss_scale = 1.0

    def __init__(self, type="diff", **kwargs):
        if type == "diff":
            super().__init__(
                matching_mat=M.ICECREAM1,
                temporal_init_range_end=100,
                temporal_range_type="expand",
                **kwargs,
            )
        else:
            super().__init__(
                matching_mat=M.ICECREAM1, temporal_range_type="all", **kwargs
            )


class IceCreamDynamicLoss(ShapeMatchingLoss):
    """reference icecreamdynamic_loss.py:14-52 — ICECREAM shape matching,
    expand curriculum from 200, reward 0.001*(1700 - step)."""

    reward_scale = 0.001
    reward_offset = 1700.0
    step_loss_scale = 0.001

    def __init__(self, type="diff", **kwargs):
        if type == "diff":
            super().__init__(
                matching_mat=M.ICECREAM,
                temporal_init_range_end=200,
                temporal_range_type="expand",
                **kwargs,
            )
        else:
            super().__init__(
                matching_mat=M.ICECREAM, temporal_range_type="all", **kwargs
            )


class GatheringEasyLoss(Loss):
    """reference gatheringeasy_loss.py:14-134 — sum |x - 0.8| over the
    matching (rigid duck) particles, reward 0.01*(150 - step)."""

    reward_scale = 0.01
    reward_offset = 150.0
    step_loss_scale = 0.01

    def __init__(self, type="diff", matching_mat=M.RIGID, **kwargs):
        if type == "diff":
            kwargs.update(
                plateau_count_limit=10,
                temporal_expand_speed=120,
                temporal_init_range_end=120,
                temporal_range_type="expand",
                plateau_thresh=(1e-6, 0.1),
            )
        else:
            kwargs.update(temporal_range_type="all")
        super().__init__(**kwargs)
        self.matching_mat = matching_mat

    def build(self, sim):
        self.dist_weight = self.weights.get("dist", 1.0)
        super().build(sim)

    def loss_fn(self, state, params, aux_t):
        x = state.particles.x  # (3, N)
        match = state.particles.used & (params.p_mat == self.matching_mat)
        dist = jnp.sum(jnp.where(match, jnp.abs(x[0] - 0.8), 0.0))
        return {"step_loss": dist * self.dist_weight}


class GatheringOLoss(GatheringEasyLoss):
    """reference gatheringO_loss.py:14-133 — squared distance to the target
    point (0.88, z=0.78), reward 0.01*(65 - step)."""

    reward_scale = 0.01
    reward_offset = 65.0

    def loss_fn(self, state, params, aux_t):
        x = state.particles.x  # (3, N)
        match = state.particles.used & (params.p_mat == self.matching_mat)
        d = (x[0] - 0.88) ** 2 + (x[2] - 0.78) ** 2
        dist = jnp.sum(jnp.where(match, d, 0.0))
        return {"step_loss": dist * self.dist_weight}


class PouringLoss(Loss):
    """reference pouring_loss.py:14-203 — milk stay-still + water height
    terms; plus a final-step attraction toward the best (lowest) water
    particle, with the best particle chosen host-side between iterations.

    The reference picks the best particle with numpy mid-rollout
    (find_best_particle, :102-121).  Host callbacks inside a jitted scan
    would break the TPU pipeline, so we reformulate: the attraction target
    and per-particle score are computed *before* each rollout from the
    previous iteration's final state (one iteration of lag, same fixed
    point) and passed in as loss constants."""

    reward_scale = 0.001
    reward_offset = 5000.0
    step_loss_scale = 0.001

    def __init__(self, type="diff", **kwargs):
        super().__init__(**kwargs)
        self.type = type
        self.plateau_count_limit = 10
        self.temporal_expand_speed = 0
        self.temporal_init_range_end = 0
        self.temporal_range_type = "all"
        self.plateau_thresh = [1e-6, 0.1]
        self.dist_scale = 0.0 if type == "diff" else 0.2
        self._attraction_ready = False

    def build(self, sim):
        self.dist_weight = self.weights.get("dist", 1.0)
        self.attraction_weight = self.weights.get("attraction", 0.0)
        super().build(sim)
        x0 = np.asarray(sim.init_state.particles.x)  # (3, N)
        self.init_particle_pos = jnp.asarray(x0)
        n = x0.shape[1]
        self.best_particle_pos = jnp.zeros(3, jnp.float32)
        self.attraction_score = jnp.full((n,), 10**6, jnp.int32)
        self.attraction_scale = jnp.zeros((), jnp.float32)

    def update_attraction_from_state(self, x, used, mat):
        """Host-side best-particle selection (reference :102-121), fed by
        the previous iteration's final state.  x: (3, N) SoA."""
        x = np.asarray(x).T  # (N, 3)
        used = np.asarray(used)
        loss = np.abs(x[:, 1] - 0.05)
        loss[~used] = 1000.0
        loss[mat != M.WATER] = 1000.0
        best = int(np.argmin(loss))
        self.best_particle_pos = jnp.asarray(x[best].astype(np.float32))
        dist = np.linalg.norm(x - x[best], axis=1)
        dist[~used] = 1000.0
        dist[mat != M.WATER] = 1000.0
        score = np.argsort(np.argsort(dist)).astype(np.int32)
        self.attraction_score = jnp.asarray(score)
        xm = x.copy()
        xm[mat != M.WATER] = -100.0
        xm[~used] = -100.0
        self.attraction_scale = jnp.float32(np.sum(xm[:, 1] > 0.55) / 12500.0)
        self._attraction_ready = True

    def loss_aux(self):
        # flag the last step for the attraction term
        flags = np.zeros(self.max_loss_steps, dtype=np.float32)
        flags[-1] = 1.0
        return jnp.asarray(flags)

    def loss_params(self):
        """Attraction constants as traced jit arguments — the solver
        updates them every Adam iteration (one-iteration lag vs the
        reference's mid-rollout numpy pick, pouring_loss.py:102-121)
        without retracing the fwd+bwd program."""
        return dict(
            best_pos=self.best_particle_pos,
            score=self.attraction_score,
            scale=self.attraction_scale,
            ready=jnp.float32(1.0 if self._attraction_ready else 0.0),
        )

    def loss_fn(self, state, params, aux_t, lp=None):
        if lp is None:
            lp = self.loss_params()
        x = state.particles.x  # (3, N)
        used = state.particles.used
        water = params.p_mat == M.WATER
        milk = params.p_mat == M.MILK
        dist = jnp.sum(
            jnp.where(
                used & water, jnp.abs(x[1] - 0.05) * self.dist_scale, 0.0
            )
        ) + jnp.sum(
            jnp.where(
                (used & milk)[None, :],
                jnp.abs(x - self.init_particle_pos),
                0.0,
            )
        )
        step = dist * self.dist_weight + self.attraction_weight
        if self.type == "diff":
            near = (lp["score"] < 100) & used & water
            attraction = (
                jnp.sum(
                    jnp.where(
                        near[None, :],
                        jnp.abs(x - lp["best_pos"][:, None]),
                        0.0,
                    )
                )
                * 5000.0
                * lp["scale"]
            )
            step = step + lp["ready"] * aux_t * attraction
        return {"step_loss": step}


class TransportingLoss(Loss):
    """reference transporting_loss.py:14-157 — rigid-cube progress
    sum|x - 0.9| + O(N*M) water<->cube attraction, reward 0.05*(135-step)."""

    reward_scale = 0.05
    reward_offset = 135.0
    step_loss_scale = 1.0

    def __init__(self, type="diff", **kwargs):
        super().__init__(temporal_range_type="all", **kwargs)
        self.type = type

    def build(self, sim):
        self.dist_weight = self.weights.get("dist", 1.0)
        super().build(sim)
        mat = np.asarray(sim.params.p_mat)
        self._water_mask = jnp.asarray(mat == M.WATER)
        self._obj_mask = jnp.asarray(mat == M.RIGID_HEAVY)

    def loss_fn(self, state, params, aux_t):
        x = state.particles.x  # (3, N)
        used = state.particles.used
        dist = jnp.sum(jnp.where(self._obj_mask, jnp.abs(x[0] - 0.9), 0.0))
        step = dist * self.dist_weight
        if self.type == "diff":
            # O(N*Mo) pairwise L1 attraction (reference :99-102); the
            # object cube is small, gather its particles
            wmask = (used & self._water_mask).astype(x.dtype)
            (obj_idx,) = jnp.nonzero(
                self._obj_mask, size=self._obj_count(), fill_value=0
            )
            xo = x[:, obj_idx]  # (3, Mo)
            diff = sum(
                jnp.abs(x[d][:, None] - xo[d][None, :]) for d in range(3)
            )  # (N, Mo)
            attraction = jnp.sum(diff * wmask[:, None]) * 1e-4
            step = step + attraction
        return {"step_loss": step}

    def _obj_count(self):
        return int(np.asarray(self._obj_mask).sum())


class MixingLoss(Loss):
    """reference mixing_loss.py:14-129 — negative pairwise spread of the
    first 10% of MILK_VIS particles (maximize dispersion), O(n^2)."""

    reward_scale = 0.1
    reward_offset = -41.0
    step_loss_scale = 1.0

    def __init__(self, type="diff", **kwargs):
        if type == "diff":
            kwargs.update(
                plateau_count_limit=5,
                temporal_expand_speed=80,
                temporal_init_range_end=80,
                temporal_range_type="all",
                plateau_thresh=(1e-6, 0.1),
            )
        else:
            kwargs.update(temporal_range_type="all")
        super().__init__(**kwargs)

    def build(self, sim):
        self.dist_weight = self.weights.get("dist", 1.0)
        super().build(sim)
        mat = np.asarray(sim.params.p_mat)
        self.n_particles_milk = int((mat == M.MILK_VIS).sum() * 0.1)

    def episode_reward(self, step_losses):
        # reward = 0.1 * (-loss - 41) (reference :121-124)
        return float(np.sum((-step_losses - 41.0) * 0.1))

    def get_step_loss(self, v):
        return {"loss": v, "reward": 0.1 * (-v - 41.0)}

    def loss_fn(self, state, params, aux_t):
        n = self.n_particles_milk
        x = state.particles.x[:, :n]  # (3, n)
        diff = sum(
            jnp.abs(x[d][:, None] - x[d][None, :]) for d in range(3)
        )
        return {"step_loss": -jnp.sum(diff) * 1e-4 * self.dist_weight}


class CirculationLoss(Loss):
    """reference circulation_loss.py:14-142 — L1 temperature error at 15
    detector voxels in the smoke q-field; hot targets (first 5) at 1.0,
    cold at 0.0; reward 1.0*(11 - step)."""

    reward_scale = 1.0
    reward_offset = 11.0
    step_loss_scale = 1.0

    DETECTORS = np.array(
        [
            [25, 64, 85], [35, 64, 85], [15, 64, 85], [25, 64, 75], [25, 64, 95],
            [25, 64, 42], [35, 64, 42], [15, 64, 42], [25, 64, 32], [25, 64, 52],
            [107, 64, 65], [115, 64, 65], [99, 64, 65], [107, 64, 45], [107, 64, 85],
        ],
        dtype=np.int32,
    )

    def __init__(self, type="diff", grid_res=128, **kwargs):
        super().__init__(temporal_range_type="all", **kwargs)
        self.plateau_count_limit = 10
        self.grid_res = grid_res

    def build(self, sim):
        self.temp_weight = self.weights.get("temp", 1.0)
        super().build(sim)
        dets = self.DETECTORS
        if self.grid_res != 128:  # scale detector voxels for test grids
            dets = np.clip(
                (dets.astype(np.float64) * self.grid_res / 128).astype(np.int32),
                0, self.grid_res - 1,
            )
        self._det = jnp.asarray(dets)
        targets = np.zeros(len(self.DETECTORS), np.float32)
        targets[:5] = 1.0
        self._targets = jnp.asarray(targets)

    def expand_temporal_range(self, total_loss):
        # reference overrides it to a no-op (circulation_loss.py:128-129)
        pass

    def loss_fn(self, state, params, aux_t):
        q = state.smoke.q  # (q_dim, R, R, R)
        d = self._det
        vals = q[0, d[:, 0], d[:, 1], d[:, 2]]
        temp = jnp.sum(jnp.abs(vals - self._targets))
        return {"step_loss": temp * self.temp_weight}


class RLTestLoss(Loss):
    """reference rltest_loss.py:14-58 — distance of the (rigid) effector
    to a fixed goal point; gradient-stopped in the reference
    (ti.ad.grad_replaced no-op), used as an RL smoke-test reward."""

    reward_scale = 10.0
    reward_offset = 0.5
    step_loss_scale = 1.0

    GOAL = (0.8, 0.5, 0.5)

    def loss_fn(self, state, params, aux_t):
        pos = state.effectors[0].pos
        goal = jnp.asarray(self.GOAL, pos.dtype)
        d = jnp.sqrt(jnp.sum((pos - goal) ** 2) + 1e-12)
        return {"step_loss": jax.lax.stop_gradient(d)}



class ScoopingLoss(Loss):
    """Scooping (beyond-reference: the reference registers Scooping-v0
    but ships no implementation, reference envs/__init__.py:4-10) —
    lift the rigid object out of the water: squared height deficit below
    ``lift_y`` summed over the matching (rigid) particles."""

    reward_scale = 0.05
    reward_offset = 50.0
    step_loss_scale = 0.05
    lift_y = 0.75

    def __init__(self, type="diff", matching_mat=M.RIGID, **kwargs):
        if type == "diff":
            kwargs.update(
                plateau_count_limit=10,
                temporal_expand_speed=100,
                temporal_init_range_end=100,
                temporal_range_type="expand",
                plateau_thresh=(1e-6, 0.1),
            )
        else:
            kwargs.update(temporal_range_type="all")
        super().__init__(**kwargs)
        self.matching_mat = matching_mat

    def build(self, sim):
        self.lift_weight = self.weights.get("lift", 1.0)
        super().build(sim)

    def loss_fn(self, state, params, aux_t):
        x = state.particles.x  # (3, N)
        match = state.particles.used & (params.p_mat == self.matching_mat)
        deficit = jnp.maximum(self.lift_y - x[1], 0.0) ** 2
        return {
            "step_loss": jnp.sum(jnp.where(match, deficit, 0.0))
            * self.lift_weight
        }


class StabilizingLoss(Loss):
    """Stabilizing (beyond-reference, like Scooping) — keep the elastic
    column's particles at their build-time rest positions: squared
    displacement from x0 summed over the matching particles."""

    reward_scale = 0.02
    reward_offset = 100.0
    step_loss_scale = 0.02

    def __init__(self, type="diff", matching_mat=M.ELASTIC, **kwargs):
        kwargs.update(temporal_range_type="all")
        super().__init__(**kwargs)
        self.matching_mat = matching_mat

    def build(self, sim):
        self.dist_weight = self.weights.get("dist", 1.0)
        # rest positions from the deterministic scene build ((N, 3) in
        # the scene dict -> engine SoA (3, N))
        self.x0 = jnp.asarray(sim.particles["x"].T, jnp.float32)
        super().build(sim)

    def loss_fn(self, state, params, aux_t):
        x = state.particles.x  # (3, N)
        match = state.particles.used & (params.p_mat == self.matching_mat)
        d2 = jnp.sum((x - self.x0) ** 2, axis=0)
        return {
            "step_loss": jnp.sum(jnp.where(match, d2, 0.0))
            * self.dist_weight
        }
