"""Host-side optimizers for trajectory parameters.

Numpy Adam with bias correction, matching the reference update rule
exactly (reference fluidlab/optimizer/optim.py:3-41) so optimization
trajectories are comparable; float64 moments like the reference.
"""

from __future__ import annotations

import numpy as np


class Optimizer:
    def __init__(self, parameters_shape, cfg):
        self.cfg = cfg
        self.lr = cfg["lr"] if isinstance(cfg, dict) else cfg.lr
        self.init_lr = self.lr
        self.parameters_shape = parameters_shape
        self.initialize()

    def _get(self, key, default=None):
        if isinstance(self.cfg, dict):
            return self.cfg.get(key, default)
        return getattr(self.cfg, key, default)

    def initialize(self):
        raise NotImplementedError

    def step(self, parameters, grads):
        return self._step(parameters, grads)


class Adam(Optimizer):
    def initialize(self):
        self.momentum_buffer = np.zeros(self.parameters_shape, np.float64)
        self.v_buffer = np.zeros_like(self.momentum_buffer)
        self.iter = 0

    def _step(self, parameters, grads):
        beta_1 = self._get("beta_1", 0.9)
        beta_2 = self._get("beta_2", 0.999)
        epsilon = self._get("epsilon", 1e-8)
        m_t = beta_1 * self.momentum_buffer + (1 - beta_1) * grads
        v_t = beta_2 * self.v_buffer + (1 - beta_2) * (grads * grads)
        self.momentum_buffer[:] = m_t
        self.v_buffer[:] = v_t
        m_cap = m_t / (1 - beta_1 ** (self.iter + 1))
        v_cap = v_t / (1 - beta_2 ** (self.iter + 1))
        self.iter += 1
        return parameters - (self.lr * m_cap) / (np.sqrt(v_cap) + epsilon)
