"""Differentiable trajectory optimization.

Redesign of the reference solver (reference fluidlab/optimizer/
solver.py:10-101).  The reference interleaves thousands of per-substep
kernel launches with host Python for the forward and reverse sweeps; here
one jitted function computes the whole rollout loss *and* its action
gradient via ``jax.grad`` through the checkpointed scan.  Per iteration
only the loss scalars and the (H+1, A) gradient cross the host boundary.

Differences vs the reference, by design:

- The reference truncates the forward at the curriculum horizon and the
  backward at ``policy.freeze_till`` (solver.py:30-53).  We always run the
  full horizon and mask instead (temporal mask on the loss, trainable
  mask on the update) — bit-identical parameter updates, zero recompiles
  when the curriculum advances.
- Scripted policy phases that read live effector state run on-device via
  the policy's action overlay (see optimizer/policies.py).
"""

from __future__ import annotations

import os
import pickle as pkl
import time

import jax
import jax.numpy as jnp
import numpy as np

from fluidlab_tpu.engine.rollout import make_segmented_fwd_bwd
from fluidlab_tpu.optimizer.policies import make_scripted_overlay


class Solver:
    def __init__(self, env, logger=None, cfg=None):
        self.cfg = cfg
        self.env = env
        self.logger = logger

    def _build_fwd_bwd(self, policy):
        sim = self.env.sim
        loss = sim.loss
        overlay = make_scripted_overlay(policy)
        aux = loss.loss_aux()
        H = self.env.horizon
        Ha = self.env.horizon_action
        action_mask = jnp.asarray(np.arange(H) < Ha)
        params = sim.params
        state0 = sim.init_state

        seg_len = sim.auto_seg_len(H)
        if seg_len is not None and seg_len < H:
            # Host-segmented backward: bounded compiled-program size, the
            # workaround for the TPU worker fault on monolithic fwd+bwd at
            # large N x horizon (see FluidSim.auto_seg_len).
            # Segment remat window: None = per-step checkpoint (safe
            # default); FL_SEG_WINDOW=0 disables remat inside segments
            # (backward reads saved residuals — no recompute, ~13%
            # faster at 65k, RESULTS.md — at O(seg_len) residual HBM).
            sw = os.environ.get("FL_SEG_WINDOW")
            seg_fb = make_segmented_fwd_bwd(
                sim.cfg, loss_fn=loss.loss_fn,
                smoke_step_fn=sim._smoke_step_fn,
                window=int(sw) if sw is not None else None,
                action_overlay=overlay, seg_len=seg_len,
            )

            def fwd_bwd_seg(actions_v, action_p, loss_mask, lp=None):
                acts = jnp.zeros((H, actions_v.shape[-1]), actions_v.dtype)
                acts = acts.at[:Ha].set(actions_v)
                tot, step_out, final, (d_a, g_p) = seg_fb(
                    state0, params, acts, action_mask, action_p, aux,
                    loss_mask, lp,
                )
                final_p = (
                    (final.particles.x, final.particles.used)
                    if final.particles is not None
                    else None
                )
                return tot, step_out, final_p, (d_a[:Ha], g_p)

            return fwd_bwd_seg

        rollout = sim.make_rollout_fn(action_overlay=overlay)

        def total_loss_with_final(actions_v, action_p, loss_mask, lp,
                                  state0_, params_, aux_):
            acts = jnp.zeros((H, actions_v.shape[-1]), actions_v.dtype)
            acts = acts.at[:Ha].set(actions_v)
            final, step_out = rollout(
                state0_, params_, acts, action_mask, action_p, aux_,
                loss_params=lp,
            )
            step_losses = step_out["step_loss"]
            total = jnp.sum(step_losses * loss_mask)
            final_p = (
                (final.particles.x, final.particles.used)
                if final.particles is not None
                else None
            )
            return total, (step_out, final_p)

        # state0/params/aux enter as ARGUMENTS, not closure constants:
        # baked-in loss targets are ~460 MB at the full LatteArt spec,
        # and this remote-compile tunnel rejects program uploads that
        # large (HTTP 413) — the segmented path always passed them as
        # args, which is why it never hit the limit.
        @jax.jit
        def fwd_bwd_full(actions_v, action_p, loss_mask, lp, state0_,
                         params_, aux_):
            (tot, (step_out, final_p)), grads = jax.value_and_grad(
                total_loss_with_final, argnums=(0, 1), has_aux=True
            )(actions_v, action_p, loss_mask, lp, state0_, params_, aux_)
            return tot, step_out, final_p, grads

        def fwd_bwd(actions_v, action_p, loss_mask, lp=None):
            return fwd_bwd_full(
                actions_v, action_p, loss_mask, lp, state0, params, aux
            )

        return fwd_bwd

    def solve(self):
        env = self.env
        cfg = self.cfg
        policy = env.trainable_policy(_sub(cfg, "optim"), _sub(cfg, "init_range"))
        # optional warm start: resume a solve from a saved policy's
        # action arrays (Adam moments restart — same as the reference
        # resuming from a dumped policy pkl, optimizer/solver.py:40-44)
        ws = _get(cfg, "warmstart")
        if ws is not None:
            policy.actions_v[:] = np.asarray(ws["actions_v"], np.float64)
            if policy.actions_p is not None and ws.get("actions_p") is not None:
                policy.actions_p[:] = np.asarray(ws["actions_p"], np.float64)
        loss = env.sim.loss
        # full resume (actions + Adam moments + freeze/lr + curriculum +
        # iteration counter): chains one long solve across tunnel
        # sessions with a course identical to an uninterrupted run
        it0 = 0
        rs = _get(cfg, "resume")
        if rs is not None:
            policy.load_state_dict(rs["policy"])
            if loss is not None and rs.get("loss") is not None:
                loss.load_state_dict(rs["loss"])
            it0 = int(rs.get("iteration", 0))
        self.policy = policy
        self.loss = loss
        fwd_bwd = self._build_fwd_bwd(policy)
        n_iters = _get(cfg, "n_iters", 100)

        for iteration in range(it0, it0 + n_iters):
            if self.logger is not None:
                self.logger.save_policy(policy, iteration)

            t1 = time.time()
            loss_mask = loss.temporal_mask()
            tot, step_out, final_p, (g_v, g_p) = fwd_bwd(
                jnp.asarray(policy.actions_v, jnp.float32),
                jnp.asarray(policy.actions_p, jnp.float32),
                loss_mask,
                loss.loss_params(),
            )
            step_losses = np.asarray(step_out["step_loss"], np.float64)
            grad = np.concatenate(
                [np.asarray(g_v, np.float64), np.asarray(g_p, np.float64)[None]],
                axis=0,
            )
            t2 = time.time()

            loss_info = loss.get_final_loss_info(step_losses)
            loss_info["iteration"] = iteration
            policy.optimize(grad, loss_info)

            # host-lagged loss constants (Pouring attraction: the reference
            # picks the best particle mid-rollout with numpy,
            # pouring_loss.py:102-121; we feed it from this iteration's
            # final state into the next).  The constants enter the jitted
            # fwd_bwd as ARGUMENTS (loss.loss_params()), so this update
            # never retraces.
            if hasattr(loss, "update_attraction_from_state") and final_p is not None:
                loss.update_attraction_from_state(
                    final_p[0], final_p[1], np.asarray(env_mat(self.env))
                )

            print(
                f"=======> iter {iteration}: loss {loss_info['loss']:.4f} "
                f"fwd+bwd {t2 - t1:.2f}s", flush=True,
            )
            if self.logger is not None:
                loss_info["lr"] = policy.optim.lr
                self.logger.log(iteration, loss_info)

            # periodic visual monitor: replay the current policy and dump
            # a rendered frame (reference optimizer/solver.py:60-71
            # renders on-screen every 50 iterations; headless here, so
            # the frame goes to the logger's image writer)
            render_every = _get(cfg, "render_every", 0)
            if (
                render_every
                and self.logger is not None
                and iteration % render_every == 0
                and getattr(env.sim, "renderer", None) is not None
            ):
                self._render_policy_frame(policy, iteration)
        self._next_iteration = it0 + n_iters
        return policy

    def snapshot(self):
        """Resume snapshot after ``solve`` returns: pass as
        ``cfg['resume']`` to a fresh Solver to continue the course."""
        return {
            "policy": self.policy.state_dict(),
            "loss": self.loss.state_dict() if self.loss is not None else None,
            "iteration": int(self._next_iteration),
        }

    def _render_policy_frame(self, policy, iteration):
        """Replay the current policy forward and write the final frame."""
        env = self.env
        env.reset()
        sim = env.sim
        ap = policy.get_actions_p()
        if ap is not None:
            sim.apply_agent_action_p(ap)
        for t in range(env.horizon):
            a = policy.get_action_v(t) if t < env.horizon_action else None
            sim.step(a)
        img = np.asarray(sim.render("rgb_array"))
        self.logger.write_img(img, iteration, env.horizon - 1)


def env_mat(env):
    return env.sim.params.p_mat


def _get(cfg, key, default=None):
    if cfg is None:
        return default
    if isinstance(cfg, dict):
        return cfg.get(key, default)
    return getattr(cfg, key, default)


def _sub(cfg, key):
    v = _get(cfg, key)
    return v


def solve_policy(env, logger, cfg):
    env.reset()
    solver = Solver(env, logger, cfg)
    return solver.solve()
