"""Batched multi-start trajectory planning over a device mesh.

This is the distributed layer the reference does not have (SURVEY.md
§2.13: single CUDA device, serial Adam loop, optimizer/solver.py:60-71).
The TPU-native design from BASELINE.json:

- K perturbed action sequences roll out **data-parallel** over a
  ``jax.sharding.Mesh`` axis ``'rollout'`` (embarrassingly parallel: zero
  cross-chip traffic inside the hot scan),
- per-rollout losses and action gradients are reduced with XLA
  collectives (argmin + gather of the winner) once per MPC iteration —
  collectives ride ICI within a slice, DCN only at iteration boundaries,
- the winner's gradient updates the shared base trajectory (Adam state on
  device, replicated).

Everything — K rollouts, backward passes, reduction, Adam update — is one
jitted function; only scalars leave the device.
"""

from __future__ import annotations

from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_rollout_mesh(n_devices: Optional[int] = None, devices=None) -> Mesh:
    """1-D mesh over the rollout (data-parallel) axis."""
    if devices is None:
        devices = jax.devices()
        if n_devices is not None:
            devices = devices[:n_devices]
    return Mesh(np.asarray(devices), ("rollout",))


class MultiStartPlanner:
    """Gradient-descent trajectory optimization with K parallel perturbed
    starts, sharded over a device mesh.

    Single-rollout mode (K=1, no mesh) reproduces the reference solver's
    optimization exactly; K>1 adds the multi-start exploration axis.
    """

    def __init__(
        self,
        sim,
        horizon_action: int,
        action_range,
        n_rollouts: int = 8,
        noise_scale: float = 1e-3,
        lr: float = 1e-3,
        beta_1: float = 0.9,
        beta_2: float = 0.99,
        epsilon: float = 1e-8,
        mesh: Optional[Mesh] = None,
        action_overlay=None,
        seed: int = 0,
    ):
        self.sim = sim
        self.cfg = sim.cfg
        self.K = n_rollouts
        self.Ha = horizon_action
        self.H = sim.cfg.horizon
        self.A = sim.cfg.agent.action_dim if sim.cfg.agent else 0
        self.noise_scale = noise_scale
        self.action_range = action_range
        self.mesh = mesh
        self.hyper = dict(lr=lr, beta_1=beta_1, beta_2=beta_2, epsilon=epsilon)
        self.key = jax.random.PRNGKey(seed)

        rollout = sim.make_rollout_fn(action_overlay=action_overlay)
        loss_aux = sim.loss.loss_aux() if sim.loss else None
        params = sim.params
        state0 = sim.init_state
        H, Ha, A = self.H, self.Ha, self.A
        action_mask = jnp.asarray(np.arange(H) < Ha)

        def single_loss(actions_v, action_p, loss_mask):
            acts = jnp.zeros((H, A), actions_v.dtype).at[:Ha].set(actions_v)
            _, step_out = rollout(
                state0, params, acts, action_mask, action_p, loss_aux
            )
            return jnp.sum(step_out["step_loss"] * loss_mask), step_out

        grad_fn = jax.value_and_grad(single_loss, argnums=(0, 1), has_aux=True)

        def train_step(base_v, base_p, opt_state, key, loss_mask,
                       trainable_mask, noise_scale):
            # K perturbations; rollout 0 is unperturbed
            key, sub = jax.random.split(key)
            noise = (
                jax.random.normal(sub, (self.K, Ha, A), base_v.dtype)
                * noise_scale
            )
            noise = noise.at[0].set(0.0)
            cand_v = jnp.clip(
                base_v[None] + noise, action_range[0], action_range[1]
            )
            cand_p = jnp.broadcast_to(base_p, (self.K, A))

            (losses, _), (g_v, g_p) = jax.vmap(
                lambda v, p: grad_fn(v, p, loss_mask)
            )(cand_v, cand_p)

            # best-trajectory selection: one collective per MPC iteration
            best = jnp.argmin(losses)
            best_v = cand_v[best]
            best_gv = g_v[best]
            best_gp = g_p[best]

            # masked Adam on the winner (semantics of the reference numpy
            # Adam + trainable/fix masks, optimizer/optim.py:28-41)
            grads = jnp.concatenate([best_gv, best_gp[None]], axis=0)
            grads = grads * trainable_mask[:, None]
            m, v, t = opt_state
            b1, b2, eps = (
                self.hyper["beta_1"], self.hyper["beta_2"], self.hyper["epsilon"],
            )
            m = b1 * m + (1 - b1) * grads
            v = b2 * v + (1 - b2) * grads * grads
            t = t + 1
            m_hat = m / (1 - b1 ** t)
            v_hat = v / (1 - b2 ** t)
            comp = jnp.concatenate([best_v, base_p[None]], axis=0)
            comp = comp - self.hyper["lr"] * m_hat / (jnp.sqrt(v_hat) + eps)
            new_v = jnp.clip(comp[:-1], action_range[0], action_range[1])
            new_p = comp[-1]
            return new_v, new_p, (m, v, t), key, losses[best], losses

        if mesh is not None:
            # shard the K axis over the mesh; everything else replicated
            cand_sharding = NamedSharding(mesh, P("rollout"))
            repl = NamedSharding(mesh, P())
            self._train_step = jax.jit(
                train_step,
                in_shardings=(repl, repl, (repl, repl, repl), repl, repl,
                              repl, repl),
                out_shardings=(repl, repl, (repl, repl, repl), repl, repl,
                               cand_sharding),
            )
        else:
            self._train_step = jax.jit(train_step)

    def init_opt_state(self):
        shape = (self.Ha + 1, self.A)
        return (
            jnp.zeros(shape, jnp.float32),
            jnp.zeros(shape, jnp.float32),
            jnp.zeros((), jnp.int32),
        )

    def step(self, base_v, base_p, opt_state, loss_mask=None,
             trainable_mask=None, noise_scale=None):
        """One MPC iteration: K rollouts -> best selection -> Adam."""
        if loss_mask is None:
            loss_mask = (
                self.sim.loss.temporal_mask()
                if self.sim.loss
                else jnp.ones((self.H,), jnp.float32)
            )
        if trainable_mask is None:
            trainable_mask = jnp.ones((self.Ha + 1,), jnp.float32)
        if noise_scale is None:
            noise_scale = self.noise_scale
        base_v, base_p, opt_state, self.key, best_loss, losses = (
            self._train_step(
                base_v, base_p, opt_state, self.key, loss_mask,
                trainable_mask, jnp.float32(noise_scale),
            )
        )
        return base_v, base_p, opt_state, float(best_loss), losses

    def solve(self, n_iters: int, init_v=None, init_p=None, callback=None):
        base_v = (
            jnp.zeros((self.Ha, self.A), jnp.float32)
            if init_v is None
            else jnp.asarray(init_v, jnp.float32)
        )
        base_p = (
            jnp.full((self.A,), 0.5, jnp.float32)
            if init_p is None
            else jnp.asarray(init_p, jnp.float32)
        )
        opt_state = self.init_opt_state()
        history = []
        for it in range(n_iters):
            base_v, base_p, opt_state, best, losses = self.step(
                base_v, base_p, opt_state
            )
            history.append(best)
            if callback is not None:
                callback(it, best, base_v, base_p)
        return base_v, base_p, history
