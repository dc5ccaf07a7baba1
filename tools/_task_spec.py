"""Shared solve-spec env builder for the hardware solve and replay
tools — ONE source of truth for the density / horizon / pool knobs so a
replay (tools/render_task_policy.py) always reconstructs exactly the
scene its policy was solved on (tools/tpu_task_solve.py).

Env knobs read here:
  FL_TASK_FRAC     density fraction of the class default (default 0.25)
  FL_TASK_DENSITY  absolute particle_density override (wins over FRAC)
  FL_TASK_POOL     pool_scale override (injector tasks)
  FL_TASK_H        horizon override (horizon_action clamped to it)
"""
import os


def resolve_task(name):
    """Experiment short name -> (exp cfg dict, env id, env class)."""
    from fluidlab_tpu.config.experiments import load_config
    from fluidlab_tpu.envs import tasks as T

    cfg = load_config(name)
    env_id = cfg["EXP"]["env_name"]
    base_cls = getattr(T, env_id.replace("-v0", "") + "Env")
    return cfg, env_id, base_cls


def make_spec_cls(base_cls, renderer=False):
    """Subclass ``base_cls`` at the env-knob solve spec.

    renderer=False silences the renderer (solve processes); True keeps
    the env's own camera setup on the native renderer (replay/render).
    """
    frac = float(os.environ.get("FL_TASK_FRAC", 0.25))
    density = os.environ.get("FL_TASK_DENSITY")
    pool = os.environ.get("FL_TASK_POOL")
    ref_density = float(getattr(base_cls, "particle_density", 1e6))

    class SpecTask(base_cls):
        if os.environ.get("FL_TASK_H"):
            horizon = int(os.environ["FL_TASK_H"])
            horizon_action = min(
                int(os.environ["FL_TASK_H"]), base_cls.horizon_action
            )

        def __init__(self, **kw):
            if density is not None:
                kw.setdefault("particle_density", float(density))
            else:
                kw.setdefault("particle_density", frac * ref_density)
            if pool is not None:
                kw.setdefault("pool_scale", float(pool))
            if renderer:
                kw.setdefault("renderer_type", "native")
            super().__init__(**kw)

    if not renderer:
        def setup_renderer(self):
            self.sim.renderer = None

        SpecTask.setup_renderer = setup_renderer
    return SpecTask


class ChainCourseLogger:
    """Course-line logger + best-iterate policy capture for the chained
    solve tools.

    Solver.solve calls ``save_policy(policy, i)`` BEFORE evaluating
    iteration i and ``log(i, info)`` after (by which time the live
    policy has already been Adam-updated) — so the stash taken in
    save_policy is exactly the iterate that produced ``info['loss']``.
    The best iterate across ALL segments persists at ``best_out``
    (existing file seeds the threshold on resume).
    """

    def __init__(self, course=None, best_out=None):
        import time

        self.course = course
        self.best_out = best_out
        self.t_last = time.time()
        self.best = float("inf")
        self._stash = None
        self._tr = None
        if best_out and os.path.exists(best_out):
            import pickle

            with open(best_out, "rb") as f:
                d = pickle.load(f)
            self.best = float(d.get("loss", float("inf")))
            self._tr = d.get("temporal_range")

    def save_policy(self, policy, iteration):
        if self.best_out:
            import numpy as np

            ap = policy.actions_p
            self._stash = (
                np.asarray(policy.actions_v).copy(),
                None if ap is None else np.asarray(ap).copy(),
            )

    def log(self, iteration, info):
        import time

        now = time.time()
        if self.course:
            with open(self.course, "a") as f:
                f.write(
                    f"{iteration} {info['loss']:.4f} "
                    f"{now - self.t_last:.1f} lr={info.get('lr', 0):.2e} "
                    f"tr={info.get('temporal_range')}\n"
                )
        self.t_last = now
        # losses are only comparable within one temporal-curriculum
        # range (expansion rescales the objective) — reset the
        # threshold when the range moves so "best" tracks the CURRENT
        # phase, i.e. the most-optimized full-horizon iterate late on
        tr = info.get("temporal_range")
        if self._tr is not None and tr != self._tr:
            self.best = float("inf")
        self._tr = tr
        if self.best_out and self._stash is not None \
                and float(info["loss"]) < self.best:
            import pickle

            self.best = float(info["loss"])
            tmp = self.best_out + ".tmp"
            with open(tmp, "wb") as f:
                pickle.dump({"actions_v": self._stash[0],
                             "actions_p": self._stash[1],
                             "iteration": iteration,
                             "loss": self.best,
                             "temporal_range": tr}, f)
            os.replace(tmp, self.best_out)
