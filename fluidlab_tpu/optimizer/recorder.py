"""Goal recording and replay (reference fluidlab/optimizer/recorder.py).

``record``: run the env's demo policy, dump the per-step particle
trajectory as the task target pkl (reference :15-63).
``replay_target``: visualize a recorded target (:65-74).
``replay_policy``: roll out a saved policy pkl (:76-101).
"""

from __future__ import annotations

import os
import pickle as pkl

import numpy as np


class Recorder:
    def __init__(self, env):
        self.env = env
        self.target_file = getattr(env, "target_file", None)
        if self.target_file is not None:
            os.makedirs(os.path.dirname(self.target_file), exist_ok=True)

    def record(self, user_input=False, render=False, save_dir=None):
        policy = self.env.demo_policy(user_input)
        sim = self.env.sim

        target = {"x": [], "used": [], "mat": None}
        self.env.reset()
        action_p = policy.get_actions_p()
        if action_p is not None:
            sim.apply_agent_action_p(action_p)

        for i in range(self.env.horizon):
            action = (
                policy.get_action_v(i) if i < self.env.horizon_action else None
            )
            sim.step(action)
            if self.target_file is not None:
                target["x"].append(
                    np.asarray(sim.state.particles.x, np.float32)  # (3, N)
                )
                target["used"].append(
                    np.asarray(sim.state.particles.used).astype(np.int32)
                )
            if render and save_dir is not None:
                img = sim.render("rgb_array")
                _write_img(img, os.path.join(save_dir, f"{i:04d}.png"))

        if self.target_file is not None:
            target["mat"] = np.asarray(sim.params.p_mat)
            with open(self.target_file, "wb") as f:
                pkl.dump(target, f)
            print(f"===> New target generated and dumped to {self.target_file}.")

    def replay_target(self, render=True, save_dir=None):
        with open(self.target_file, "rb") as f:
            target = pkl.load(f)
        sim = self.env.sim
        frames = []
        for i in range(self.env.horizon):
            xt = np.asarray(target["x"][i])
            if xt.shape[0] != 3:  # legacy (N, 3) targets
                xt = xt.T
            sim.state = sim.state.replace(
                particles=sim.state.particles.replace(
                    x=xt, used=np.asarray(target["used"][i]).astype(bool),
                )
            )
            if render and sim.renderer is not None:
                img = sim.render("rgb_array")
                frames.append(img)
                if save_dir is not None:
                    _write_img(img, os.path.join(save_dir, f"{i:04d}.png"))
        return frames

    def replay_policy(self, policy_path, render=False, save_dir=None):
        sim = self.env.sim
        with open(policy_path, "rb") as f:
            policy = pkl.load(f)
        self.env.reset()
        sim.apply_agent_action_p(policy.get_actions_p())
        for i in range(self.env.horizon):
            action = (
                policy.get_action_v(i) if i < self.env.horizon_action else None
            )
            sim.step(action)
            if render and save_dir is not None:
                _write_img(
                    sim.render("rgb_array"),
                    os.path.join(save_dir, f"{i:04d}.png"),
                )


def _write_img(img, path):
    os.makedirs(os.path.dirname(path), exist_ok=True)
    try:
        from PIL import Image

        Image.fromarray(img).save(path)
    except ImportError:
        np.save(path + ".npy", img)


def record_target(env, path=None, user_input=False):
    env.reset()
    Recorder(env).record(user_input)


def replay_target(env):
    env.reset()
    Recorder(env).replay_target()


def replay_policy(env, path=None):
    env.reset()
    Recorder(env).replay_policy(path)
