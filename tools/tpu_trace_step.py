"""Capture a jax.profiler trace of the jitted forward control step and
summarize it (tools/xplane_summary.py) — for bisecting forward-path
regressions (e.g. the persistent-binning m=2 slowdown, RESULTS.md).

Usage:
    python tools/tpu_trace_step.py [N] [binning_mode] [margin] [trace_dir]

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
    from fluidlab_tpu.utils.bench_scenes import liquid_block_scene

    N = int(sys.argv[1]) if len(sys.argv) > 1 else 65536
    bmode = sys.argv[2] if len(sys.argv) > 2 else "substep"
    margin = int(sys.argv[3]) if len(sys.argv) > 3 else (
        2 if bmode == "step" else 0
    )
    trace_dir = sys.argv[4] if len(sys.argv) > 4 else "/tmp/fluidlab_trace_step"

    cfg, params, state = liquid_block_scene(n_particles=N, horizon=10)
    cfg = dataclasses.replace(
        cfg, p2g_impl="regions", g2p_impl="regions",
        binning_mode=bmode, binning_margin=margin,
    )
    step = make_step(cfg)
    act = jnp.zeros((1,), jnp.float32)
    ha = jnp.asarray(False)

    fn = jax.jit(lambda s: step(s, params, act, ha))
    t0 = time.perf_counter()
    s = fn(state)
    jax.block_until_ready(s)
    print(f"compile+first: {time.perf_counter() - t0:.1f}s", flush=True)

    t0 = time.perf_counter()
    for _ in range(3):
        s = fn(s)
    jax.block_until_ready(s)
    dt = (time.perf_counter() - t0) / (3 * cfg.n_substeps)
    print(f"steady: {dt * 1e3:.2f} ms/substep ({1 / dt:.1f} substeps/s)",
          flush=True)

    os.system(f"rm -rf {trace_dir}")
    with jax.profiler.trace(trace_dir):
        s = fn(s)
        jax.block_until_ready(s)
    print("trace captured to", trace_dir, flush=True)
    os.system(
        "PROTOCOL_BUFFERS_PYTHON_IMPLEMENTATION=python "
        f"python {os.path.dirname(os.path.abspath(__file__))}"
        f"/xplane_summary.py {trace_dir} {cfg.n_substeps}"
    )


if __name__ == "__main__":
    main()
