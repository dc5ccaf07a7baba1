"""Shape-matching loss against a recorded target trajectory.

Reference: fluidlab/fluidengine/losses/shapematching_loss.py:14-128.
Per step s: sum over used particles of the matching material of the
squared distance to the recorded target position.
"""

from __future__ import annotations

import pickle as pkl

import jax.numpy as jnp
import numpy as np

from fluidlab_tpu.losses.base import Loss


class ShapeMatchingLoss(Loss):
    def __init__(self, matching_mat, **kwargs):
        kwargs.setdefault("temporal_range_type", "expand")
        super().__init__(**kwargs)
        self.matching_mat = matching_mat
        self.target = None

    def build(self, sim):
        self.chamfer_weight = self.weights.get("chamfer", 1.0)
        super().build(sim)

    def load_target(self, path):
        """Target pkl: {'x': [(3, N)]*H, 'used': [(N,)]*H, 'mat': (N,)}
        (reference recorder.py:26-62, shapematching_loss.py:52-57; SoA
        layout)."""
        with open(path, "rb") as f:
            self.target = pkl.load(f)
        assert self.max_loss_steps == len(self.target["x"])
        tgt = np.stack(self.target["x"]).astype(np.float32)
        if tgt.shape[1] != 3:  # legacy (H, N, 3) targets
            tgt = tgt.transpose(0, 2, 1)
        self._tgt_x = jnp.asarray(tgt)  # (H, 3, N)

    def loss_aux(self):
        if self.target is None:
            return None
        return self._tgt_x

    def loss_fn(self, state, params, aux_t):
        x = state.particles.x  # (3, N)
        used = state.particles.used
        match = used & (params.p_mat == self.matching_mat)
        d2 = jnp.sum((x - aux_t) ** 2, axis=0)
        chamfer = jnp.sum(jnp.where(match, d2, 0.0))
        return {"step_loss": chamfer * self.chamfer_weight}
