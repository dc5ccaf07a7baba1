"""Capture a jax.profiler trace of the jitted fwd+bwd rollout and
summarize it (tools/xplane_summary.py) — for bisecting backward-path
costs (post-merge moment kernel, d_vregions accumulate, residual saves).

Usage:
    python tools/tpu_trace_grad.py [N] [H] [window] [trace_dir]

Env: BENCH_PLATFORM to force a backend; FL_* knobs apply as usual.
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    import jax

    if os.environ.get("BENCH_PLATFORM"):
        jax.config.update("jax_platforms", os.environ["BENCH_PLATFORM"])
    os.makedirs("/tmp/fluidlab_tpu_jax_cache", exist_ok=True)
    jax.config.update("jax_compilation_cache_dir",
                      "/tmp/fluidlab_tpu_jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

    import dataclasses

    import jax.numpy as jnp

    from fluidlab_tpu.engine.mpm import make_step
    from fluidlab_tpu.engine.rollout import checkpointed_scan
    from fluidlab_tpu.utils.bench_scenes import liquid_block_scene

    N = int(sys.argv[1]) if len(sys.argv) > 1 else 65536
    H = int(sys.argv[2]) if len(sys.argv) > 2 else 5
    window = int(sys.argv[3]) if len(sys.argv) > 3 else 0
    trace_dir = sys.argv[4] if len(sys.argv) > 4 else "/tmp/fluidlab_trace_grad"

    cfg, params, state = liquid_block_scene(n_particles=N, horizon=H)
    cfg = dataclasses.replace(cfg, p2g_impl="regions", g2p_impl="regions")
    step = make_step(cfg)
    ha = jnp.asarray(False)
    print(f"devices: {jax.devices()}", flush=True)

    def loss_fn(v0, s0):
        s0 = s0.replace(particles=s0.particles.replace(v=v0))

        def body(s, a):
            s1 = step(s, params, a, ha)
            return s1, jnp.sum(s1.particles.v ** 2)

        actions = jnp.zeros((H, 1), jnp.float32)
        sH, per = checkpointed_scan(body, s0, actions, window=window)
        return jnp.sum(per) + jnp.sum(jnp.abs(sH.particles.x))

    vg = jax.jit(jax.value_and_grad(loss_fn))
    t0 = time.perf_counter()
    val, g = vg(state.particles.v, state)
    jax.block_until_ready((val, g))
    print(f"compile+first: {time.perf_counter() - t0:.1f}s "
          f"loss={float(val):.3f}", flush=True)

    t0 = time.perf_counter()
    for _ in range(3):
        val, g = vg(state.particles.v, state)
    jax.block_until_ready((val, g))
    dt = (time.perf_counter() - t0) / (3 * H * cfg.n_substeps)
    print(f"steady: {dt * 1e3:.2f} ms/substep fwd+bwd "
          f"({1 / dt:.1f} substeps/s)", flush=True)

    os.system(f"rm -rf {trace_dir}")
    with jax.profiler.trace(trace_dir):
        val, g = vg(state.particles.v, state)
        jax.block_until_ready((val, g))
    print("trace captured to", trace_dir, flush=True)
    os.system(
        "PROTOCOL_BUFFERS_PYTHON_IMPLEMENTATION=python "
        f"python {os.path.dirname(os.path.abspath(__file__))}"
        f"/xplane_summary.py {trace_dir} {H * cfg.n_substeps}"
    )


if __name__ == "__main__":
    main()
