"""Minimal example: differentiable dam break in 40 lines.

Builds a water block, rolls it out under gravity, differentiates the
final center-of-mass height w.r.t. the initial velocity, and renders a
frame with the native renderer.

Run: python examples/minimal_dam_break.py
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from fluidlab_tpu.config import materials as M
from fluidlab_tpu.engine.sim import FluidSim

sim = FluidSim(particle_density=1e5, horizon=60)
sim.add_body(
    type="cube", lower=(0.1, 0.06, 0.1), upper=(0.4, 0.5, 0.4),
    material=M.WATER,
)
sim.build()
print(f"{sim.cfg.n_particles} particles")

# interactive stepping (gym-style)
for i in range(20):
    sim.step(None)
x = np.asarray(sim.state.particles.x)  # (3, N)
print(f"t=40ms  com={x.mean(1).round(3)}")

# differentiable rollout: d(final height)/d(initial v)
rollout = sim.make_rollout_fn()
actions = jnp.zeros((60, 1), jnp.float32)


def final_height(v0):
    st = sim.init_state
    st = st.replace(particles=st.particles.replace(
        v=jnp.broadcast_to(v0[:, None], st.particles.v.shape)
    ))
    final, _ = rollout(st, sim.params, actions)
    return jnp.mean(final.particles.x[1])


g = jax.jit(jax.grad(final_height))(jnp.zeros(3))
print("d(final mean height)/d(v0) =", np.asarray(g).round(4))

# render
from fluidlab_tpu.render.native_renderer import NativeRenderer

r = NativeRenderer(res=(384, 384), camera_pos=(1.4, 0.9, 1.4),
                   camera_lookat=(0.4, 0.25, 0.4), fov=35)
r.build(sim)
img = r.render_frame(sim)
try:
    from PIL import Image

    Image.fromarray(img).save("/tmp/dam_break.png")
    print("frame written to /tmp/dam_break.png")
except ImportError:
    pass
