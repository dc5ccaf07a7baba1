"""Capture a jax.profiler trace of the jitted smoke control step and
summarize it (tools/xplane_summary.py) — to split the 128^3 step cost
between advection gathers, the Jacobi scan and the divergence/gradient
stencils (r6 measured 228 ms/step total; roofline says the Jacobi
alone should be ~2-5 ms).

Usage:
    python tools/tpu_trace_smoke.py [res] [iters] [trace_dir]

Env: BENCH_PLATFORM to force a backend; FL_TRILERP applies.
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

    import jax.numpy as jnp

    from fluidlab_tpu.engine.config import SimCfg, SmokeCfg
    from fluidlab_tpu.engine.scene import SceneParams
    from fluidlab_tpu.engine.smoke import (
        compute_free_mask,
        init_smoke_state,
        make_smoke_step,
    )
    from fluidlab_tpu.engine.types import SimState

    res = int(sys.argv[1]) if len(sys.argv) > 1 else 128
    iters = int(sys.argv[2]) if len(sys.argv) > 2 else 50
    trace_dir = (
        sys.argv[3] if len(sys.argv) > 3 else "/tmp/fluidlab_trace_smoke"
    )

    print(f"devices: {jax.devices()}", flush=True)
    smoke_cfg = SmokeCfg(res=res, solver_iters=iters)
    cfg = SimCfg(n_particles=0, n_bodies=0, n_statics=0, smoke=smoke_cfg)
    params = SceneParams(smoke_free=compute_free_mask(smoke_cfg, []))
    state = SimState(particles=None, effectors=(),
                     smoke=init_smoke_state(smoke_cfg),
                     f_global=jnp.zeros((), jnp.int32))
    step = jax.jit(make_smoke_step(cfg))

    t0 = time.perf_counter()
    s = jax.block_until_ready(step(state, params))
    print(f"compile+first: {time.perf_counter() - t0:.1f}s", flush=True)

    t0 = time.perf_counter()
    for _ in range(3):
        # block per step: through the axon tunnel a tail-only block can
        # report enqueue latency instead of device time (r2: 0.22 ms/step
        # "steady" vs 3.1 ms of traced busy time)
        s = jax.block_until_ready(step(s, params))
    dt = (time.perf_counter() - t0) / 3
    print(f"steady: {dt * 1e3:.2f} ms/step ({1 / dt:.1f} steps/s) "
          f"res={res} jacobi={iters}", flush=True)

    os.system(f"rm -rf {trace_dir}")
    with jax.profiler.trace(trace_dir):
        s = step(s, params)
        jax.block_until_ready(s)
    print("trace captured to", trace_dir, flush=True)
    os.system(
        "PROTOCOL_BUFFERS_PYTHON_IMPLEMENTATION=python "
        f"python {os.path.dirname(os.path.abspath(__file__))}"
        f"/xplane_summary.py {trace_dir} 1"
    )


if __name__ == "__main__":
    main()
