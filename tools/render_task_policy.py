"""Replay a solved task policy and render artifact frames (CPU-friendly).

Replays a policy pkl ({"actions_v", "actions_p"}, as written by
tools/tpu_task_solve.py / tpu_circulation_solve.py) through the task
env at the SOLVE spec (density fraction / horizon) and renders start /
mid / final frames with the native fluid-surface renderer.

Env knobs (mirror tools/tpu_task_solve.py so the replay matches the
solve exactly):
  FL_TASK          experiment short name (config/experiments.py)
  FL_TASK_FRAC     density fraction of the class default (default 0.25)
  FL_TASK_DENSITY  absolute density override
  FL_TASK_POOL     pool_scale override
  FL_TASK_H        horizon override
  FL_POLICY        policy pkl path (default artifacts/r4b/<task>_solve_r4_policy.pkl)
  FL_RENDER_OUT    output png path (default artifacts/<task>_solve_r4.png);
                   start/mid frames land alongside with _start/_mid suffixes
  FL_RENDER_EVERY  also write an animated GIF sampling every K steps
                   (0 = stills only, default 0)
  BENCH_PLATFORM   'cpu' to force the CPU backend (default here)

Reference anchor: fluidlab/optimizer/recorder.py replay_policy role +
FlexRenderer offline frames.
"""
import os
import pickle
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import jax

# rendering is a host-side pass over replayed states: default to CPU so
# this never contends for the chip (set BENCH_PLATFORM=axon to override)
jax.config.update("jax_platforms", os.environ.get("BENCH_PLATFORM", "cpu"))
import numpy as np

from _task_spec import make_spec_cls, resolve_task

NAME = os.environ.get("FL_TASK", "pouring")
cfg, env_id, base_cls = resolve_task(NAME)

POLICY = os.environ.get(
    "FL_POLICY", f"artifacts/r4b/{NAME}_solve_r4_policy.pkl")
OUT = os.environ.get("FL_RENDER_OUT", f"artifacts/{NAME}_solve_r4.png")

RenderTask = make_spec_cls(base_cls, renderer=True)


with open(POLICY, "rb") as f:
    pol = pickle.load(f)
if "policy" in pol:  # solver chain snapshot (Solver.snapshot())
    params = np.asarray(pol["policy"]["params"], np.float64)
    actions_v, actions_p = params[:-1], params[-1]
    print(f"chain snapshot at iteration {pol['iteration']}", flush=True)
else:  # plain policy dict ({"actions_v", "actions_p"})
    actions_v = np.asarray(pol["actions_v"])
    actions_p = np.asarray(pol["actions_p"])

t0 = time.time()
env = RenderTask(loss=False, seed=0)
sim = env.sim
print(f"env: {env_id} N={sim.cfg.n_particles} H={env.horizon} "
      f"({time.time()-t0:.0f}s)", flush=True)

env.reset()
sim.apply_agent_action_p(actions_p)
H = env.horizon
marks = {0, H // 2, H - 1}
suffix = {0: "_start", H // 2: "_mid", H - 1: ""}


def _write(img, path):
    try:
        from PIL import Image

        Image.fromarray(img).save(path)
    except ImportError:
        import matplotlib

        matplotlib.use("Agg")
        import matplotlib.pyplot as plt

        plt.imsave(path, img)
    print(f"wrote {path}", flush=True)


EVERY = int(os.environ.get("FL_RENDER_EVERY", 0))
gif_frames = []
for t in range(H):
    a = actions_v[t] if t < min(env.horizon_action, len(actions_v)) else None
    sim.step(a)
    if t in marks or (EVERY and t % EVERY == 0):
        img = np.asarray(sim.render("rgb_array"))
        if t in marks:
            _write(img, OUT.replace(".png", f"{suffix[t]}.png"))
        if EVERY and t % EVERY == 0:
            gif_frames.append(img)
    if t % 100 == 0:
        print(f"step {t}/{H} ({time.time()-t0:.0f}s)", flush=True)
if gif_frames:
    try:
        from PIL import Image

        ims = [Image.fromarray(f).reduce(2) for f in gif_frames]
        gif = OUT.replace(".png", ".gif")
        ims[0].save(gif, save_all=True, append_images=ims[1:],
                    duration=80, loop=0)
        print(f"wrote {gif} ({len(ims)} frames)", flush=True)
    except ImportError:
        pass
print(f"RENDER DONE ({time.time()-t0:.0f}s)", flush=True)
