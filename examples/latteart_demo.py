"""Render a LatteArt demo rollout to PNG frames (visual artifact).

Runs the scripted sine-sweep demo policy (reference
fluidlab/envs/latteart_env.py:113-140) at reduced particle density and
writes frames via the native C++ renderer (falls back to the point
renderer if the native lib is unavailable).

Usage: python examples/latteart_demo.py [n_steps] [density] [outdir]
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    import jax

    if not any("TPU" in str(d) for d in jax.devices()):
        jax.config.update("jax_platforms", "cpu")
    jax.config.update(
        "jax_compilation_cache_dir", "/tmp/fluidlab_tpu_jax_cache"
    )

    import numpy as np

    from fluidlab_tpu.envs import make

    n_steps = int(sys.argv[1]) if len(sys.argv) > 1 else 60
    density = float(sys.argv[2]) if len(sys.argv) > 2 else 1e5
    outdir = sys.argv[3] if len(sys.argv) > 3 else "/tmp/latteart_frames"
    os.makedirs(outdir, exist_ok=True)

    env = make(
        "LatteArt-v0", particle_density=density, loss=False,
        renderer_type=os.environ.get("FL_RENDERER", "native"),
    )
    env.reset()
    policy = env.demo_policy()
    sim = env.sim  # drive the sim directly (loss-free, recorder-style)
    action_p = policy.get_actions_p()
    if action_p is not None:
        sim.apply_agent_action_p(action_p)
    frame_every = max(1, n_steps // 12)
    for t in range(n_steps):
        action = policy.get_action_v(t)
        sim.step(action)
        if t % frame_every == 0 or t == n_steps - 1:
            frame = np.asarray(env.render("rgb_array"))
            path = os.path.join(outdir, f"{t:04d}.png")
            try:
                from PIL import Image

                Image.fromarray(frame[..., :3].astype(np.uint8)).save(path)
            except ImportError:
                np.save(path + ".npy", frame)
            print(f"step {t:4d}: wrote {path}", flush=True)
    print(f"frames in {outdir}")


if __name__ == "__main__":
    main()
