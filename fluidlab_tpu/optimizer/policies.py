"""Trajectory policies: recorded, interactive and trainable.

Redesign of the reference policy layer (reference fluidlab/optimizer/
policies.py:10-367).  A ``TrainablePolicy`` holds one stacked numpy
parameter array (velocity rows + a final pose row), a trainable row mask,
and the Adam state; per-task subclasses add freeze/lr schedules.

The reference's Gathering/Mixing policies mutate actions *during* the
forward rollout from the live effector position (policies.py:240-258,
318-325).  Inside a jitted scan that becomes a *scripted overlay*: a pure
function of (state, raw action, step index) evaluated on-device — same
trajectories, no host round-trips (see ``make_scripted_overlay``).
"""

from __future__ import annotations

from typing import Optional

import jax.numpy as jnp
import numpy as np

from fluidlab_tpu.optimizer.optim import Adam, Optimizer  # noqa: F401


class ActionsPolicy:
    """Fixed recorded actions (reference policies.py:10-19)."""

    def __init__(self, comp_actions):
        self.actions_v = comp_actions[:-1]
        self.actions_p = comp_actions[-1]

    def get_actions_p(self):
        return self.actions_p

    def get_action_v(self, i, **kwargs):
        return self.actions_v[i]


class KeyboardPolicy:
    """Interactive keyboard control (reference policies.py:21-85).
    Requires pynput; raises if unavailable (headless)."""

    def __init__(self, init_p, v_lin=0.003, v_ang=0.03):
        from pynput import keyboard  # noqa: F401  (optional dep)

        self.actions_p = init_p
        self.keys_activated = set()
        self.linear_v_mag = v_lin
        self.angular_v_mag = v_ang
        self.listener = keyboard.Listener(
            on_press=self._on_press, on_release=self._on_release
        )
        self.listener.start()

    def _on_press(self, key):
        try:
            self.keys_activated.add(key.char)
        except AttributeError:
            pass

    def _on_release(self, key):
        try:
            self.keys_activated.discard(key.char)
        except AttributeError:
            pass

    def get_actions_p(self):
        return self.actions_p

    # (action_dim, {key: (index, sign)}) per variant; magnitudes chosen
    # per reference policies.py:49-86 (numpad 4/6/2/8 = +-x/+-y, z/x =
    # +-yaw).
    _DIRMAP: dict = {}
    _ACTION_DIM = 6

    def get_action_v(self, i, **kwargs):
        a = np.zeros(self._ACTION_DIM)
        for key, (idx, sign, ang) in self._DIRMAP.items():
            if key in self.keys_activated:
                mag = self.angular_v_mag if ang else self.linear_v_mag
                a[idx] += sign * mag
        return a


class KeyboardPolicy_vxy_wz(KeyboardPolicy):
    """xy translation + z rotation (reference policies.py:49-64)."""

    _ACTION_DIM = 6
    _DIRMAP = {
        "4": (0, -1, False), "6": (0, +1, False),
        "2": (1, -1, False), "8": (1, +1, False),
        "x": (5, -1, True), "z": (5, +1, True),
    }


class KeyboardPolicy_wz(KeyboardPolicy):
    """z rotation only (reference policies.py:66-73)."""

    _ACTION_DIM = 6
    _DIRMAP = {"x": (5, -1, True), "z": (5, +1, True)}


class KeyboardPolicy_vxy(KeyboardPolicy):
    """xy translation only (reference policies.py:75-86)."""

    _ACTION_DIM = 3
    _DIRMAP = {
        "4": (0, -1, False), "6": (0, +1, False),
        "2": (1, -1, False), "8": (1, +1, False),
    }


class MousePolicy:
    """Interactive mouse control (reference policies.py:89-114).
    Requires pynput; raises if unavailable (headless)."""

    def __init__(self, init_p):
        from pynput import mouse  # noqa: F401  (optional dep)

        self.actions_p = init_p
        self.mouse_pos = np.zeros(2)
        self.mouse_pos_last = None
        self.mouse_pressed = False
        self.started = False
        self.listener = mouse.Listener(
            on_move=self._on_move, on_click=self._on_click
        )
        self.listener.start()

    def _on_move(self, x, y):
        self.started = True
        self.mouse_pos[:] = (x, y)

    def _on_click(self, x, y, button, pressed):
        self.mouse_pos[:] = (x, y)
        self.mouse_pressed = pressed

    def get_actions_p(self):
        return self.actions_p

    def _pos_delta(self):
        if not self.started:
            return np.zeros(2)
        if self.mouse_pos_last is None:
            self.mouse_pos_last = self.mouse_pos.copy()
        d = self.mouse_pos - self.mouse_pos_last
        self.mouse_pos_last = self.mouse_pos.copy()
        return d


class MousePolicy_vxz(MousePolicy):
    """Screen-plane mouse motion -> xz velocity, 5e-4 per pixel
    (reference policies.py:116-128)."""

    def get_action_v(self, i, **kwargs):
        d = self._pos_delta()
        return np.array([d[0], 0.0, d[1]]) * 5e-4


class TrainablePolicy:
    """Trainable open-loop trajectory, optimized by the Solver.

    Parameters live in ONE ``(horizon+1, action_dim)`` float64 array:
    rows ``[0, horizon)`` are per-step velocity actions, the final row is
    the initial-pose action — the stacked layout the reference calls
    ``comp_actions`` (reference policies.py:131-164), kept so recorded
    policy pkls and the solver's gradient stack line up row for row.

    ``optimize`` zeroes gradient rows masked off by ``trainable`` (the
    freeze schedules write into that mask) and columns listed in
    ``fix_dim``, takes one Adam step, then clips the velocity rows to
    ``action_range`` (the pose row is never clipped)."""

    def __init__(self, optim_cfg, init_range, action_dim, horizon,
                 action_range, fix_dim=None):
        self.horizon = horizon
        self.action_dim = action_dim
        self.action_range = action_range
        self.fix_dim = fix_dim
        self.freeze_till = 0
        self.scripted = None  # optional on-device overlay descriptor

        lo_v, hi_v = _get(init_range, "v")
        lo_p, hi_p = _get(init_range, "p")
        self.params = np.empty((horizon + 1, action_dim), np.float64)
        self.params[:horizon] = np.random.uniform(
            lo_v, hi_v, (horizon, action_dim)
        )
        self.params[horizon] = np.random.uniform(lo_p, hi_p, action_dim)

        self.trainable = np.ones(horizon + 1, dtype=bool)
        optim_cls = {"Adam": Adam}[_get(optim_cfg, "type", "Adam")]
        self.optim = optim_cls(self.params.shape, optim_cfg)

    # -- layout views -----------------------------------------------------
    @property
    def comp_actions_shape(self):
        return self.params.shape

    @property
    def comp_actions(self):
        return self.params

    @property
    def actions_v(self):
        return self.params[:-1]

    @property
    def actions_p(self):
        return self.params[-1]

    def get_actions_p(self):
        return self.actions_p

    def get_action_v(self, i, **kwargs):
        return self.actions_v[i]

    # -- resume -----------------------------------------------------------
    def state_dict(self):
        """Full optimizer-visible state for cross-session solve chaining
        (actions + freeze mask + Adam moments + lr) — the reference's
        per-iteration policy pkl carries the same information via
        pickling the whole object (reference utils/logger.py:41-44)."""
        st = self.optim._state
        return {
            "params": self.params.copy(),
            "trainable": self.trainable.copy(),
            "freeze_till": int(self.freeze_till),
            "lr": float(self.optim.lr),
            "optim_mean": st.mean.copy(),
            "optim_var": st.var.copy(),
            "optim_count": int(st.count),
        }

    def load_state_dict(self, d):
        from fluidlab_tpu.optimizer.optim import AdamState

        self.params = np.asarray(d["params"], np.float64).copy()
        self.trainable = np.asarray(d["trainable"], bool).copy()
        self.freeze_till = int(d["freeze_till"])
        self.optim.lr = float(d["lr"])
        self.optim._state = AdamState(
            mean=np.asarray(d["optim_mean"], np.float64).copy(),
            var=np.asarray(d["optim_var"], np.float64).copy(),
            count=int(d["optim_count"]),
        )

    # -- update -----------------------------------------------------------
    def optimize(self, grads, loss_info):
        grads = np.asarray(grads, np.float64)
        if grads.shape != self.params.shape:
            raise ValueError(
                f"gradient shape {grads.shape} != params {self.params.shape}"
            )
        masked = np.where(self.trainable[:, None], grads, 0.0)
        if self.fix_dim is not None:
            masked[:, self.fix_dim] = 0.0
        new = self.optim.step(self.params, masked)
        np.clip(new[:-1], *self.action_range, out=new[:-1])
        self.params = new


def _get(cfg, key, default=None):
    if cfg is None:
        return default
    if isinstance(cfg, dict):
        return cfg.get(key, default)
    return getattr(cfg, key, default)


class LatteArtPolicy(TrainablePolicy):
    pass


class LatteArtStirPolicy(TrainablePolicy):
    """lr decay + freezing as the temporal range expands (reference
    policies.py:172-192)."""

    def optimize(self, grads, loss_info):
        super().optimize(grads, loss_info)
        tr = loss_info["temporal_range"]
        if tr > 250:
            self.optim.lr = self.optim.init_lr * 0.2
        elif tr > 150:
            self.optim.lr = self.optim.init_lr * 0.5
        for step in [400, 350, 300, 250, 200, 150, 100]:
            if tr > step:
                self.freeze_till = step - 100
                self.trainable[: self.freeze_till] = False
                break


class IceCreamDynamicPolicy(TrainablePolicy):
    """Trains only steps 169+ (reference policies.py:195-200)."""

    def __init__(self, *args, **kwargs):
        super().__init__(*args, **kwargs)
        self.trainable = np.full(self.comp_actions_shape[0], False)
        self.trainable[169:-1] = True


class IceCreamStaticPolicy(TrainablePolicy):
    """Gradient clip +-1e5 and lr decay (reference policies.py:203-215)."""

    def __init__(self, *args, **kwargs):
        super().__init__(*args, **kwargs)
        self.trainable = np.full(self.comp_actions_shape[0], False)
        self.trainable[:-1] = True

    def optimize(self, grads, loss_info):
        grads = np.asarray(grads).clip(-1e5, 1e5)
        super().optimize(grads, loss_info)
        if loss_info["temporal_range"] > 450:
            self.optim.lr = self.optim.init_lr * 0.1


def _stage_status(horizon, stage_step):
    """4-phase move/up/return/down cycle (reference policies.py:218-236)."""
    trainable = np.full(horizon + 1, False)
    status = np.zeros(horizon + 1, np.int32)
    for i in range(horizon):
        m = i % stage_step[3]
        if m < stage_step[0]:
            trainable[i] = True
            status[i] = 0
        elif m < stage_step[1]:
            status[i] = 1
        elif m < stage_step[2]:
            status[i] = 2
        else:
            status[i] = 3
    return trainable, status


class GatheringPolicy(TrainablePolicy):
    """reference policies.py:218-265: scripted 4-phase cycle, only 'move'
    segments trainable; freeze-behind as the range expands."""

    stage_step = (50, 65, 105, 120)

    def __init__(self, *args, **kwargs):
        super().__init__(*args, **kwargs)
        self.trainable, self.status = _stage_status(self.horizon, self.stage_step)
        self.scripted = dict(
            kind="gathering", status=self.status[:-1], stage_step=self.stage_step
        )

    def optimize(self, grads, loss_info):
        for step in [720, 600, 480, 360, 240, 120]:
            if loss_info["temporal_range"] > step:
                self.freeze_till = loss_info["temporal_range"] - 120
                self.trainable[: self.freeze_till] = False
                break
        super().optimize(grads, loss_info)


class GatheringOPolicy(TrainablePolicy):
    """reference policies.py:268-304 (no freezing schedule)."""

    stage_step = (50, 65, 105, 120)

    def __init__(self, *args, **kwargs):
        super().__init__(*args, **kwargs)
        self.trainable, self.status = _stage_status(self.horizon, self.stage_step)
        self.scripted = dict(
            kind="gathering", status=self.status[:-1], stage_step=self.stage_step
        )


class MixingPolicy(TrainablePolicy):
    """reference policies.py:306-339: 2-phase stir/return cycle."""

    stage_step = (50, 80)

    def __init__(self, *args, **kwargs):
        super().__init__(*args, **kwargs)
        self.trainable = np.full(self.comp_actions_shape[0], False)
        self.status = np.zeros(self.comp_actions_shape[0], np.int32)
        for i in range(self.horizon):
            if i % self.stage_step[1] < self.stage_step[0]:
                self.trainable[i] = True
            else:
                self.status[i] = 1
        self.scripted = dict(
            kind="mixing", status=self.status[:-1], stage_step=self.stage_step,
            home=np.array([0.5, 0.73, 0.5]),
        )

    def optimize(self, grads, loss_info):
        super().optimize(grads, loss_info)
        for step in list(range(80, 2000, 80))[::-1]:
            if loss_info["temporal_range"] > step:
                self.freeze_till = loss_info["temporal_range"] - 160
                self.trainable[: self.freeze_till] = False
                break


class CirculationPolicy(TrainablePolicy):
    """Plateau-halving lr schedule (deliberate deviation: the reference
    runs a bare constant lr 5e-3 for 1000 iterations,
    exp_circulation.yaml + reference policies.py:341-343, but our
    measured H=500 hardware course diverges after iter ~41 at that lr —
    loss 4979.70 -> 4363.60 -> back to ~4630-4790, textbook too-hot-lr
    wobble; artifacts/circulation_r3_course.log).  Halve lr after
    ``patience`` iterations without improving the best loss, floored at
    init_lr/32.  patience=20 clears the longest improvement gap (17
    iters) measured on the r3 constant-lr course BEFORE its minimum, so
    decay cannot fire during a healthy descent."""

    patience = 20

    def __init__(self, *args, **kwargs):
        super().__init__(*args, **kwargs)
        self._best_loss = float("inf")
        self._stall = 0

    def optimize(self, grads, loss_info):
        super().optimize(grads, loss_info)
        loss = float(loss_info["loss"])
        if loss < self._best_loss - 1e-9:
            self._best_loss = loss
            self._stall = 0
        else:
            self._stall += 1
        if self._stall >= self.patience:
            self._stall = 0
            self.optim.lr = max(
                self.optim.lr * 0.5, self.optim.init_lr / 32.0
            )

    def state_dict(self):
        d = super().state_dict()
        d["sched_best_loss"] = float(self._best_loss)
        d["sched_stall"] = int(self._stall)
        return d

    def load_state_dict(self, d):
        super().load_state_dict(d)
        self._best_loss = float(d.get("sched_best_loss", float("inf")))
        self._stall = int(d.get("sched_stall", 0))


class PouringPolicy(TrainablePolicy):
    pass


class TransportingPolicy(TrainablePolicy):
    def __init__(self, *args, **kwargs):
        super().__init__(*args, **kwargs)
        self.trainable = np.full(self.comp_actions_shape[0], False)
        self.trainable[:-1] = True


def make_scripted_overlay(policy: TrainablePolicy):
    """Turn a policy's scripted phases into a pure on-device overlay
    ``(state, a_raw, t, actions_p) -> a``, replacing the reference's
    live-rollout action mutation (policies.py:240-258, 318-325)."""
    if policy.scripted is None:
        return None
    desc = policy.scripted
    status = jnp.asarray(desc["status"])

    if desc["kind"] == "gathering":
        s0, s1, s2, s3 = desc["stage_step"]

        def overlay(state, a, t, actions_p):
            st = status[t]
            eff_pos = state.effectors[0].pos
            cyc = t % s3
            up = jnp.asarray([0.0, 0.008, 0.0], a.dtype)
            down = jnp.asarray([0.0, -0.008, 0.0], a.dtype)
            denom = jnp.maximum(s2 - cyc, 1).astype(a.dtype)
            back = (actions_p[:3] - eff_pos) / denom
            back = back.at[1].set(0.0)
            return jnp.select(
                [st == 0, st == 1, st == 2],
                [a, up, back],
                down,
            )

        return overlay

    if desc["kind"] == "mixing":
        s0, s1 = desc["stage_step"]
        home = jnp.asarray(desc["home"], jnp.float32)

        def overlay(state, a, t, actions_p):
            st = status[t]
            eff_pos = state.effectors[0].pos
            denom = jnp.maximum(s1 - t % s1, 1).astype(a.dtype)
            back = (home - eff_pos) / denom
            return jnp.where(st == 1, back, a)

        return overlay

    raise ValueError(desc["kind"])
