"""Visual artifact: the diffuse/spray pass on a pouring LatteArt demo.

Runs the LatteArt scripted demo on CPU at reduced density and renders
the mid-pour frame with the native renderer, diffuse pass off vs on
(reference diffuse composite role, shadersGL.cpp RenderDiffuse).
Writes artifacts/renderer_diffuse_off_on.png (side by side).
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import jax

jax.config.update("jax_platforms", "cpu")
import numpy as np

from fluidlab_tpu.envs.tasks import LatteArtEnv


class DemoLatte(LatteArtEnv):
    horizon = 60
    horizon_action = 50

    def __init__(self, **kw):
        kw.setdefault("particle_density", 8e4)
        super().__init__(**kw)

    def setup_renderer(self):
        self.sim.renderer = None


env = DemoLatte(loss=False, seed=0)
policy = env.demo_policy()
env.reset()
sim = env.sim
ap = policy.get_actions_p() if hasattr(policy, "get_actions_p") else None
if ap is not None:
    sim.apply_agent_action_p(ap)
for t in range(env.horizon):
    a = policy.get_action_v(t) if t < env.horizon_action else None
    sim.step(a)
print("demo rolled out", flush=True)

from fluidlab_tpu.render.native_renderer import NativeRenderer

frames = []
for diffuse in (False, True):
    r = NativeRenderer(
        res=(480, 480), camera_pos=(0.5, 1.5, 1.35),
        camera_lookat=(0.5, 0.45, 0.5), fov=34,
        diffuse=diffuse, diffuse_speed=0.35,
    )
    r.build(sim)
    frames.append(r.render_frame(sim))

both = np.concatenate(frames, axis=1)
os.makedirs("artifacts", exist_ok=True)
try:
    from PIL import Image

    Image.fromarray(both).save("artifacts/renderer_diffuse_off_on.png")
except ImportError:
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    plt.imsave("artifacts/renderer_diffuse_off_on.png", both)
diff = (frames[0].astype(int) - frames[1].astype(int))
print(f"artifact written; changed pixels: {(np.abs(diff).sum(-1) > 0).sum()}",
      flush=True)
