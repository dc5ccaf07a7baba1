"""Replay the chained LatteArt policy at full spec on the chip and
render the final frame with the native renderer (diffuse pass on).

Reads FL_CHAIN_STATE (default /tmp/latte_chain_state.pkl), writes
FL_RENDER_OUT (default artifacts/latteart_chain_final.png) and a
mid-pour frame alongside it.
"""
import os
import pickle
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.makedirs("/tmp/fluidlab_tpu_jax_cache", exist_ok=True)
import jax

if os.environ.get("BENCH_PLATFORM"):
    # CPU replay path: slower (~minutes at full spec) but needs no chip
    jax.config.update("jax_platforms", os.environ["BENCH_PLATFORM"])
jax.config.update("jax_compilation_cache_dir", "/tmp/fluidlab_tpu_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
import numpy as np

from fluidlab_tpu.envs.tasks import LatteArtEnv  # noqa: E402


class FullLatte(LatteArtEnv):
    """Same spec as tools/tpu_latteart_chain.py (which executes a solve
    segment at import, so it cannot be imported)."""

    horizon = int(os.environ.get("FL_LATTE_H", 330))
    horizon_action = int(os.environ.get("FL_LATTE_HA", 250))
    max_substeps_local = 20

    def __init__(self, **kw):
        kw.setdefault("particle_density",
                      float(os.environ.get("FL_LATTE_DENSITY", 1e6)))
        super().__init__(**kw)

    def setup_renderer(self):
        self.sim.renderer = None


STATE = os.environ.get("FL_CHAIN_STATE", "/tmp/latte_chain_state.pkl")
OUT = os.environ.get("FL_RENDER_OUT", "artifacts/latteart_chain_final.png")

with open(STATE, "rb") as f:
    snap = pickle.load(f)
params = np.asarray(snap["policy"]["params"], np.float64)
actions_v, action_p = params[:-1], params[-1]
print(f"rendering policy at iteration {snap['iteration']}", flush=True)

t0 = time.time()
env = FullLatte(loss=False, seed=0)
sim = env.sim
env.reset()
sim.apply_agent_action_p(action_p)
frames = {}
H = env.horizon
for t in range(H):
    a = actions_v[t] if t < env.horizon_action else None
    sim.step(a)
    if t in (H // 2, H - 1):
        frames[t] = jax.tree_util.tree_map(np.asarray, sim.state)
print(f"replayed {H} steps ({time.time()-t0:.0f}s)", flush=True)

from fluidlab_tpu.render.native_renderer import NativeRenderer


class _Shim:
    pass


for t, state in frames.items():
    r = NativeRenderer(
        res=(640, 640), camera_pos=(0.5, 2.2, 0.7),
        camera_lookat=(0.5, 0.5, 0.5), fov=32, diffuse=True,
        diffuse_speed=0.5,
    )
    r.build(sim)
    shim = _Shim()
    shim.state = state
    img = r.render_frame(shim)
    path = OUT if t == H - 1 else OUT.replace(".png", "_mid.png")
    try:
        from PIL import Image

        Image.fromarray(img).save(path)
    except ImportError:
        import matplotlib

        matplotlib.use("Agg")
        import matplotlib.pyplot as plt

        plt.imsave(path, img)
    print(f"wrote {path}", flush=True)
print("RENDER DONE", flush=True)
