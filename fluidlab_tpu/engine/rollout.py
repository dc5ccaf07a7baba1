"""Differentiable rollouts: scan-over-steps with windowed rematerialization.

The reference implements gradient checkpointing by hand: it materializes a
window of `max_substeps_local` frames on-GPU, pickles window-boundary
states to disk/RAM, and replays the forward pass per window during the
backward sweep (reference mpm_simulator.py:777-912).  Here the same
compute/memory trade is expressed as a two-level checkpointed ``lax.scan``:

- outer scan over windows of ``window`` control steps, carry checkpointed,
- inner scan over steps, each step checkpointed,

so backward memory is O(H/window + window) states and backward compute is
the same 2x-forward the reference pays.  ``window`` plays exactly the role
of the reference's ``max_substeps_local / n_substeps`` knob.
"""

from __future__ import annotations

from typing import Callable, Optional

import jax
import jax.numpy as jnp

from fluidlab_tpu.engine.config import SimCfg
from fluidlab_tpu.engine.mpm import apply_action_p, make_step
from fluidlab_tpu.engine.scene import SceneParams
from fluidlab_tpu.engine.types import SimState


def checkpointed_scan(f, init, xs, window: Optional[int] = None):
    """``lax.scan`` with per-iteration remat and optional two-level
    windowing.  ``xs`` leaves must share leading dim H; if ``window``
    divides H, iterations are grouped into H/window windows with an
    additional checkpoint at window boundaries."""
    H = jax.tree_util.tree_leaves(xs)[0].shape[0]
    f_ckpt = jax.checkpoint(f)
    if window is None or window >= H or H % window != 0:
        return jax.lax.scan(f_ckpt, init, xs)

    W = H // window
    xs_w = jax.tree_util.tree_map(
        lambda a: a.reshape((W, window) + a.shape[1:]), xs
    )

    @jax.checkpoint
    def win_body(carry, xw):
        return jax.lax.scan(f_ckpt, carry, xw)

    carry, ys_w = jax.lax.scan(win_body, init, xs_w)
    ys = jax.tree_util.tree_map(
        lambda a: a.reshape((H,) + a.shape[2:]), ys_w
    )
    return carry, ys


def make_rollout(
    cfg: SimCfg,
    loss_fn: Optional[Callable] = None,
    smoke_step_fn=None,
    window: Optional[int] = None,
    action_overlay: Optional[Callable] = None,
):
    """Build ``rollout(state0, params, actions_v, action_mask, action_p,
    loss_aux) -> (final_state, per_step_losses)``.

    - ``actions_v``: (H, action_dim) step actions.
    - ``action_mask``: (H,) bool; False replicates the reference's
      ``action=None`` steps past ``horizon_action`` (solver.py:31-39):
      effectors freeze, injection stops.
    - ``action_p``: optional (action_dim,) initial-position action
      (reference apply_agent_action_p).
    - ``loss_aux``: optional pytree with leading dim H (e.g. target
      particle positions per step), sliced into ``loss_fn``.
    - ``loss_fn(state, params, aux_t) -> pytree of scalars`` evaluated
      after every control step (reference loss.step(), loss.py:72-78).
    - ``action_overlay(state, a, t, action_p) -> a``: optional pure
      on-device action rewrite per step (scripted policy phases that
      depend on live effector state, see optimizer/policies.py).
    """
    step = make_step(cfg, smoke_step_fn)

    def rollout(
        state0: SimState,
        params: SceneParams,
        actions_v,
        action_mask=None,
        action_p=None,
        loss_aux=None,
    ):
        H = actions_v.shape[0]
        if action_mask is None:
            action_mask = jnp.ones((H,), dtype=bool)
        if action_p is not None and cfg.agent is not None:
            state0 = state0.replace(
                effectors=apply_action_p(cfg, state0.effectors, action_p)
            )

        ap = action_p if action_p is not None else jnp.zeros(
            (actions_v.shape[-1],), actions_v.dtype
        )

        def body(state, inp):
            a, has_a, t, aux = inp
            if action_overlay is not None:
                a = action_overlay(state, a, t, ap)
            state = step(state, params, a, has_a)
            out = loss_fn(state, params, aux) if loss_fn is not None else 0.0
            return state, out

        xs = (actions_v, action_mask, jnp.arange(H), loss_aux)
        return checkpointed_scan(body, state0, xs, window=window)

    return rollout
