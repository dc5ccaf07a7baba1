"""Host-side parameter optimizers for trajectory optimization.

The update rule is bias-corrected Adam with float64 moment accumulators —
the same rule the reference drives its trajectory parameters with
(reference fluidlab/optimizer/optim.py:3-41) so loss courses stay
comparable — but expressed as a pure functional core (``adam_init`` /
``adam_direction``) plus a thin stateful facade consumed by the policies.
The EMA recurrences are written in incremental form, which is
algebraically identical to the textbook convex-combination form (see
tests/test_optim.py for the numeric parity check against an independent
textbook implementation).
"""

from __future__ import annotations

import dataclasses

import numpy as np


@dataclasses.dataclass
class AdamState:
    """Moment EMAs + step counter.  float64 regardless of param dtype."""

    mean: np.ndarray  # first-moment EMA of the gradient
    var: np.ndarray   # second-moment EMA of the squared gradient
    count: int = 0    # completed updates


def adam_init(shape) -> AdamState:
    z = np.zeros(shape, dtype=np.float64)
    return AdamState(mean=z, var=z.copy(), count=0)


def adam_direction(state: AdamState, grads, *, beta_1=0.9, beta_2=0.999,
                   epsilon=1e-8):
    """One Adam update: returns ``(direction, new_state)`` where the
    parameter update is ``params - lr * direction``.

    Incremental EMA form: ``m += (1-b1)(g - m)`` ==
    ``m = b1*m + (1-b1)*g``; bias correction divides by ``1 - b^t``.
    """
    g = np.asarray(grads, dtype=np.float64)
    t = state.count + 1
    mean = state.mean + (1.0 - beta_1) * (g - state.mean)
    var = state.var + (1.0 - beta_2) * (g * g - state.var)
    mean_hat = mean / (1.0 - beta_1 ** t)
    var_hat = var / (1.0 - beta_2 ** t)
    direction = mean_hat / (np.sqrt(var_hat) + epsilon)
    return direction, AdamState(mean=mean, var=var, count=t)


def _cfg_get(cfg, key, default=None):
    if cfg is None:
        return default
    if isinstance(cfg, dict):
        return cfg.get(key, default)
    return getattr(cfg, key, default)


class Optimizer:
    """Stateful facade over a functional update rule.  Subclasses
    implement ``step(parameters, grads)``.  ``lr`` is mutable (the task
    policies run lr-decay schedules on it); ``init_lr`` keeps the
    schedule's anchor."""

    def __init__(self, parameters_shape, cfg):
        self.cfg = cfg
        self.lr = float(_cfg_get(cfg, "lr", 1e-3))
        self.init_lr = self.lr
        self.parameters_shape = tuple(parameters_shape)

    def step(self, parameters, grads):
        raise NotImplementedError


class Adam(Optimizer):
    def __init__(self, parameters_shape, cfg):
        super().__init__(parameters_shape, cfg)
        self._hypers = dict(
            beta_1=float(_cfg_get(cfg, "beta_1", 0.9)),
            beta_2=float(_cfg_get(cfg, "beta_2", 0.999)),
            epsilon=float(_cfg_get(cfg, "epsilon", 1e-8)),
        )
        self._state = adam_init(self.parameters_shape)

    def step(self, parameters, grads):
        direction, self._state = adam_direction(
            self._state, grads, **self._hypers
        )
        return np.asarray(parameters, np.float64) - self.lr * direction
