"""2-D device mesh: spatial particle sharding x rollout data parallelism.

The pod-slice deployment shape SURVEY.md §2.13 sketches: shard ONE big
scene's particles over a ``'space'`` mesh axis (parallel/spatial.py) AND
batch K perturbed multi-start rollouts over an orthogonal ``'rollout'``
axis (parallel/planner.py) — in one jitted train step.  The reference
has no distributed layer at all (single CUDA device,
reference fluidlab/fluidengine/taichi_env.py:12); this is the TPU-native
composition of the two axes this framework adds.

Collective traffic per MPC iteration:

- ``'space'``: one grid psum per substep (the spatial decomposition's
  only hot-loop collective) + one loss psum per step + one gradient
  psum per rollout — all within a space column, riding ICI,
- ``'rollout'``: ONE all_gather of K scalar losses + ONE psum of the
  winner's (Ha+1, A) gradient/actions, once per iteration — the only
  cross-column traffic, so a ('space', 'rollout') slice lays 'space'
  on the fast ICI dim.

Every device holds N/n_space particles of its column's K/n_rollout
candidate rollouts; the Adam update runs replicated (all inputs are
all-gathered/psum'd, so every device computes the identical new base).
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, PartitionSpec as P

from fluidlab_tpu.engine.mpm import make_step
from fluidlab_tpu.parallel.spatial import _check_divisible, particle_specs


def make_mesh2d(n_space: int, n_rollout: int, devices=None) -> Mesh:
    """('space', 'rollout') mesh over n_space * n_rollout devices."""
    if devices is None:
        devices = jax.devices()
    devices = np.asarray(devices[: n_space * n_rollout]).reshape(
        n_space, n_rollout
    )
    return Mesh(devices, ("space", "rollout"))


def make_multistart_spatial_train_step(
    cfg,
    mesh: Mesh,
    state,
    params,
    horizon_action: int,
    action_range,
    per_particle_loss,
    n_rollouts: int,
    lr: float = 1e-3,
    beta_1: float = 0.9,
    beta_2: float = 0.99,
    epsilon: float = 1e-8,
    smoke_step_fn=None,
    jit: bool = True,
):
    """One jitted MPC iteration over the 2-D mesh.

    ``train_step(base_v, base_p, opt_state, noise, loss_mask,
    trainable_mask) -> (new_v, new_p, opt_state, best_loss, losses)``

    ``noise``: (K, Ha, A), rollout 0 conventionally zero (the
    unperturbed base); sharded over 'rollout' on its leading axis.
    ``base_*``/``opt_state`` replicated; outputs replicated except
    ``losses`` (K,), sharded over 'rollout'.

    Note: the initial-pose action row (``base_p``) rides along in the
    Adam state but is NOT applied/differentiated here — apply it to
    ``state``'s effector pose upstream (the 1-D planner differentiates
    it; this composition optimizes the velocity rows).
    """
    _check_divisible(cfg, mesh, "space")
    n_roll_dev = mesh.shape["rollout"]
    if n_rollouts % n_roll_dev:
        raise ValueError(
            f"n_rollouts={n_rollouts} must divide over the {n_roll_dev}-"
            f"device 'rollout' axis"
        )
    H, Ha = cfg.horizon, horizon_action
    A = cfg.agent.action_dim if cfg.agent else 1
    step = make_step(cfg, smoke_step_fn, psum_axis="space")
    action_mask = jnp.asarray(np.arange(H) < Ha)
    lo, hi = action_range

    def local_body(base_v, base_p, opt_state, noise, loss_mask,
                   trainable_mask, state0, params_):
        # noise arrives (K_local, Ha, A); state0/params_ are this
        # device's particle shard, identical across the rollout axis
        def rollout_loss(actions_v):
            acts = jnp.zeros((H, A), actions_v.dtype).at[:Ha].set(actions_v)

            def body(s, xs):
                a, m = xs
                s = step(s, params_, a, m)
                ls = jax.lax.psum(
                    jnp.sum(per_particle_loss(s, params_)), "space"
                )
                return s, ls

            _, losses = jax.lax.scan(body, state0, (acts, action_mask))
            return jnp.sum(losses * loss_mask)

        cand_v = jnp.clip(base_v[None] + noise, lo, hi)
        losses_l, g_l = jax.vmap(
            jax.value_and_grad(rollout_loss)
        )(cand_v)
        # total gradient over the space column.  The transpose of the
        # in-rollout loss psum is itself a psum (pmap/shard_map AD
        # rule), so each device's local grad arrives pre-multiplied by
        # n_space; pmean(n_space * dl_local) == d(sum_d l_d) exactly.
        g_l = jax.lax.pmean(g_l, "space")

        # global best over the rollout axis: (R, K_local) -> flat K
        losses_all = jax.lax.all_gather(losses_l, "rollout")  # (R, K_l)
        flat = losses_all.reshape(-1)
        best = jnp.argmin(flat)
        r_idx = jax.lax.axis_index("rollout")
        k_l = losses_l.shape[0]
        mine = (best // k_l) == r_idx
        sel = jnp.where(mine, 1.0, 0.0)
        best_gv = jax.lax.psum(sel * g_l[best % k_l], "rollout")
        best_v = jax.lax.psum(sel * cand_v[best % k_l], "rollout")
        best_loss = flat[best]

        # masked Adam on the winner (reference optim.py:28-41 semantics)
        grads = jnp.concatenate(
            [best_gv, jnp.zeros((1, A), best_gv.dtype)], axis=0
        )
        grads = grads * trainable_mask[:, None]
        m, v, t = opt_state
        m = beta_1 * m + (1 - beta_1) * grads
        v = beta_2 * v + (1 - beta_2) * grads * grads
        t = t + 1
        m_hat = m / (1 - beta_1 ** t)
        v_hat = v / (1 - beta_2 ** t)
        comp = jnp.concatenate([best_v, base_p[None]], axis=0)
        comp = comp - lr * m_hat / (jnp.sqrt(v_hat) + epsilon)
        new_v = jnp.clip(comp[:-1], lo, hi)
        new_p = comp[-1]
        return new_v, new_p, (m, v, t), best_loss, losses_l

    sspec = particle_specs(state, cfg.n_particles, "space")
    pspec = particle_specs(params, cfg.n_particles, "space")
    repl = P()

    f = jax.shard_map(
        local_body,
        mesh=mesh,
        in_specs=(repl, repl, (repl, repl, repl), P("rollout"), repl,
                  repl, sspec, pspec),
        out_specs=(repl, repl, (repl, repl, repl), repl, P("rollout")),
        check_vma=False,
    )

    def train_step(base_v, base_p, opt_state, noise, loss_mask=None,
                   trainable_mask=None):
        if loss_mask is None:
            loss_mask = jnp.ones((H,), jnp.float32)
        if trainable_mask is None:
            trainable_mask = jnp.ones((Ha + 1,), jnp.float32)
        return f(base_v, base_p, opt_state, noise, loss_mask,
                 trainable_mask, state, params)

    return jax.jit(train_step) if jit else train_step
