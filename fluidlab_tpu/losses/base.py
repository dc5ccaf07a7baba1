"""Differentiable task losses: base class + temporal curriculum.

Redesign of the reference loss layer (reference fluidlab/fluidengine/
losses/loss.py:14-78): the device side becomes a pure ``loss_fn(state,
params, aux_t) -> dict`` evaluated inside the rollout scan after every
control step; per-step values are stacked by the scan, so there are no
mutable loss fields or manual ``.grad`` sweeps.  The temporal-range
curriculum (reference shapematching_loss.py:110-128) stays host-side and
turns into a per-step weight mask over the stacked losses, so the jitted
rollout never recompiles when the range expands.
"""

from __future__ import annotations

from typing import Optional

import jax.numpy as jnp
import numpy as np


class Loss:
    INF = 1e8

    def __init__(
        self,
        max_loss_steps: int,
        weights: Optional[dict] = None,
        target_file: Optional[str] = None,
        type: str = "diff",
        temporal_range_type: str = "all",
        temporal_init_range_end: int = 50,
        plateau_count_limit: int = 5,
        temporal_expand_speed: int = 50,
        plateau_thresh=(0.01, 0.5),
    ):
        self.weights = weights or {}
        self.target_file = target_file
        self.max_loss_steps = max_loss_steps
        self.type = type

        self.temporal_range_type = temporal_range_type
        self.temporal_init_range_end = temporal_init_range_end
        self.plateau_count_limit = plateau_count_limit
        self.temporal_expand_speed = temporal_expand_speed
        self.plateau_thresh = list(plateau_thresh)
        self._init_temporal_range()

    def _init_temporal_range(self):
        if self.temporal_range_type == "last":
            self.temporal_range = [self.max_loss_steps - 1, self.max_loss_steps]
        elif self.temporal_range_type == "all":
            self.temporal_range = [0, self.max_loss_steps]
        elif self.temporal_range_type == "expand":
            self.temporal_range = [0, self.temporal_init_range_end]
            self.best_loss = self.INF
            self.plateau_count = 0
        else:
            raise ValueError(self.temporal_range_type)

    # ----------------------------------------------------------------- build
    def build(self, sim):
        """Bind to a built simulation (reference loss.py:24-47)."""
        self.sim = sim
        if self.target_file is not None:
            self.load_target(self.target_file)

    def load_target(self, path):
        pass

    def reset(self):
        pass

    # ----------------------------------------------------------- device side
    def loss_fn(self, state, params, aux_t) -> dict:
        """Per-step loss dict; must contain 'step_loss'.  Pure function,
        called inside the rollout scan."""
        raise NotImplementedError

    def loss_aux(self):
        """Optional pytree with leading dim H, sliced per step into
        ``loss_fn`` (e.g. target trajectories)."""
        return None

    def loss_params(self):
        """Optional pytree of per-rollout constants, passed to the jitted
        rollout as traced ARGUMENTS (not closure constants), so host-side
        updates between Adam iterations never retrigger compilation.
        Losses that return one must accept ``loss_fn(state, params,
        aux_t, lp)``.  (Pouring's attraction target is the use case —
        the reference recomputes it host-side every iteration,
        pouring_loss.py:102-121.)"""
        return None

    def temporal_mask(self) -> jnp.ndarray:
        """(H,) weight over per-step losses implementing the temporal
        range truncation."""
        m = np.zeros(self.max_loss_steps, dtype=np.float32)
        m[self.temporal_range[0]: self.temporal_range[1]] = 1.0
        return jnp.asarray(m)

    # ------------------------------------------------------------- host side
    def expand_temporal_range(self, total_loss: float):
        """Plateau-driven widening (reference shapematching_loss.py:110-128)."""
        if self.temporal_range_type != "expand":
            return
        loss_improved = self.best_loss - total_loss
        loss_improved_rate = loss_improved / self.best_loss
        if (
            loss_improved_rate < self.plateau_thresh[0]
            or loss_improved < self.plateau_thresh[1]
        ):
            self.plateau_count += 1
        else:
            self.plateau_count = 0
        if self.best_loss > total_loss:
            self.best_loss = total_loss
        if self.plateau_count >= self.plateau_count_limit:
            self.plateau_count = 0
            self.best_loss = self.INF
            self.temporal_range[1] = min(
                self.max_loss_steps,
                self.temporal_range[1] + self.temporal_expand_speed,
            )

    def state_dict(self):
        """Curriculum state for cross-session solve chaining."""
        d = {"temporal_range": list(self.temporal_range)}
        if self.temporal_range_type == "expand":
            d["best_loss"] = float(self.best_loss)
            d["plateau_count"] = int(self.plateau_count)
        return d

    def load_state_dict(self, d):
        self.temporal_range = list(d["temporal_range"])
        if self.temporal_range_type == "expand":
            self.best_loss = float(d.get("best_loss", self.INF))
            self.plateau_count = int(d.get("plateau_count", 0))

    def get_final_loss_info(self, step_losses: np.ndarray) -> dict:
        """Summarize a rollout's stacked per-step losses and advance the
        curriculum (reference get_final_loss, shapematching_loss.py:96-108)."""
        lo, hi = self.temporal_range
        total = float(np.sum(step_losses[lo:hi]))
        self.expand_temporal_range(total)
        info = {
            "loss": total,
            "last_step_loss": float(step_losses[self.max_loss_steps - 1]),
            "temporal_range": self.temporal_range[1],
        }
        reward = self.episode_reward(step_losses)
        if reward is not None:
            info["reward"] = reward
        return info

    # per-task affine reward maps (reference get_step_loss overrides)
    reward_scale: Optional[float] = None
    reward_offset: Optional[float] = None
    step_loss_scale: float = 1.0

    def get_step_loss(self, step_loss_value: float) -> dict:
        info = {"loss": self.step_loss_scale * step_loss_value}
        if self.reward_scale is not None:
            info["reward"] = self.reward_scale * (
                self.reward_offset - step_loss_value
            )
        return info

    def episode_reward(self, step_losses: np.ndarray):
        if self.reward_scale is None:
            return None
        return float(
            np.sum((self.reward_offset - step_losses) * self.reward_scale)
        )
