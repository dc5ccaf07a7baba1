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
    additional checkpoint at window boundaries.

    ``window=0`` disables rematerialization entirely: the backward
    reads every AD residual from the forward (no recompute — the
    backward sweep stops paying the ~1x-forward replay), at the cost
    of O(H) residual memory.  Use for short segments (the host-
    segmented backward bounds H per compiled program, so seg_len
    becomes the memory knob)."""
    H = jax.tree_util.tree_leaves(xs)[0].shape[0]
    if window == 0:
        return jax.lax.scan(f, init, xs)
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

def _float_mask(state):
    """Per-leaf bool list: True where the leaf participates in AD."""
    leaves = jax.tree_util.tree_leaves(state)
    return [jnp.issubdtype(jnp.asarray(l).dtype, jnp.inexact) for l in leaves]


def _float_leaves(state):
    mask = _float_mask(state)
    return [l for l, f in zip(jax.tree_util.tree_leaves(state), mask) if f]


def make_segment_fn(
    cfg: SimCfg,
    loss_fn: Optional[Callable] = None,
    smoke_step_fn=None,
    window: Optional[int] = None,
    action_overlay: Optional[Callable] = None,
):
    """One horizon segment: like ``make_rollout`` but with explicit step
    indices ``ts`` and no action_p prologue (the caller owns both) — the
    building block of the host-segmented backward."""
    step = make_step(cfg, smoke_step_fn)

    def segment(state, params, actions_seg, mask_seg, ts, ap, aux_seg,
                lp=None):
        def body(st, inp):
            a, has_a, t, aux = inp
            if action_overlay is not None:
                a = action_overlay(st, a, t, ap)
            st = step(st, params, a, has_a)
            out = _eval_loss(loss_fn, st, params, aux, lp)
            return st, out

        xs = (actions_seg, mask_seg, ts, aux_seg)
        return checkpointed_scan(body, state, xs, window=window)

    return segment


def _eval_loss(loss_fn, st, params, aux, lp):
    """Per-rollout loss constants ``lp`` (e.g. Pouring's attraction
    target, losses/tasks.py) ride as traced arguments so updating them
    between Adam iterations never retraces; losses that don't declare
    them keep the 3-arg signature."""
    if loss_fn is None:
        return 0.0
    if lp is None:
        return loss_fn(st, params, aux)
    return loss_fn(st, params, aux, lp)


def make_segmented_fwd_bwd(
    cfg: SimCfg,
    loss_fn: Callable,
    smoke_step_fn=None,
    window: Optional[int] = None,
    action_overlay: Optional[Callable] = None,
    seg_len: int = 25,
):
    """Host-segmented rollout gradient.

    The reference checkpoints window boundaries to RAM/disk and replays
    windows in reverse during its backward sweep (reference
    mpm_simulator.py:777-912, ``ckpt_dest`` ram/disk).  Here each
    segment of ``seg_len`` control steps is one jitted program,
    boundary states stay on-device, and the host sweeps segments in
    reverse chaining state cotangents through per-segment VJPs.

    Two compiled programs total (segment forward; segment VJP), each
    O(seg_len) — bounding compiled-program size and the live backward
    footprint regardless of H.  This is the workaround for the TPU
    worker fault hit by monolithic fwd+bwd rollouts at large
    N x horizon (RESULTS.md round-2 bisection).

    Returns ``fwd_bwd(state0, params, actions, action_mask, action_p,
    loss_aux, loss_weights) -> (total, step_out, final_state,
    (d_actions, d_action_p))`` where ``loss_weights`` (H,) weights each
    step's ``step_loss`` in the total (the solver's temporal mask).
    Gradients flow to ``actions`` and ``action_p`` (params and state0
    are treated as constants, like the monolithic solver path).
    """
    segment = make_segment_fn(
        cfg, loss_fn=loss_fn, smoke_step_fn=smoke_step_fn, window=window,
        action_overlay=action_overlay,
    )

    def _apply_ap(state0, ap):
        if cfg.agent is None:
            return state0
        return state0.replace(
            effectors=apply_action_p(cfg, state0.effectors, ap)
        )

    seg_fwd = jax.jit(segment)

    @jax.jit
    def seg_vjp(state, params, a, m, ts, ap, aux, ct_f, ct_w, lp=None):
        """One reverse-sweep step: cotangents of (float state leaves,
        weighted segment loss) -> cotangents of (entry state float
        leaves, segment actions, action_p)."""

        def f(state_, a_, ap_):
            st1, outs = segment(state_, params, a_, m, ts, ap_, aux, lp)
            lsum = jnp.sum(outs["step_loss"] * ct_w)
            return (tuple(_float_leaves(st1)), lsum)

        _, vjp = jax.vjp(f, state, a, ap)
        d_state, d_a, d_ap = vjp((tuple(ct_f), jnp.float32(1.0)))
        mask = _float_mask(state)
        d_f = [d for d, fl in zip(jax.tree_util.tree_leaves(d_state), mask)
               if fl]
        return d_f, d_a, d_ap

    def fwd_bwd(state0, params, actions, action_mask, action_p, loss_aux,
                loss_weights, loss_params=None):
        H = actions.shape[0]
        L = seg_len
        assert H % L == 0, f"seg_len {L} must divide horizon {H}"
        S = H // L
        ap = (action_p if action_p is not None
              else jnp.zeros((actions.shape[-1],), actions.dtype))

        def seg_args(s):
            sl = slice(s * L, (s + 1) * L)
            aux_s = jax.tree_util.tree_map(lambda x: x[sl], loss_aux)
            return (actions[sl], action_mask[sl],
                    jnp.arange(s * L, (s + 1) * L), aux_s)

        # ---- forward sweep: segment-boundary states stay on device
        state = _apply_ap(state0, ap)
        bounds = [state]
        outs_all = []
        for s in range(S):
            a, m, ts, aux_s = seg_args(s)
            state, outs = seg_fwd(state, params, a, m, ts, ap, aux_s,
                                  loss_params)
            bounds.append(state)
            outs_all.append(outs)
        final_state = state

        # ---- backward sweep: chain state cotangents segment by segment
        ct_f = [jnp.zeros_like(x) for x in _float_leaves(final_state)]
        d_actions = []
        d_ap = jnp.zeros_like(ap)
        for s in reversed(range(S)):
            a, m, ts, aux_s = seg_args(s)
            ct_w = loss_weights[s * L:(s + 1) * L]
            ct_f, d_a, d_ap_s = seg_vjp(
                bounds[s], params, a, m, ts, ap, aux_s, ct_f, ct_w,
                loss_params,
            )
            d_actions.append(d_a)
            d_ap = d_ap + d_ap_s

        # ---- action_p prologue (initial effector pose) cotangent
        def pro(ap_):
            return tuple(_float_leaves(_apply_ap(state0, ap_)))

        _, pro_vjp = jax.vjp(pro, ap)
        (d_ap0,) = pro_vjp(tuple(ct_f))
        d_ap = d_ap + d_ap0

        d_actions = jnp.concatenate(d_actions[::-1], axis=0)
        step_out = jax.tree_util.tree_map(
            lambda *xs: jnp.concatenate(xs, axis=0), *outs_all
        )
        total = jnp.sum(step_out["step_loss"] * loss_weights)
        return total, step_out, final_state, (d_actions, d_ap)

    return fwd_bwd


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
        loss_params=None,
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
            out = _eval_loss(loss_fn, state, params, aux, loss_params)
            return state, out

        xs = (actions_v, action_mask, jnp.arange(H), loss_aux)
        return checkpointed_scan(body, state0, xs, window=window)

    return rollout
