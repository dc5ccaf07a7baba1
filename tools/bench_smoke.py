"""SmokeField step throughput (the Circulation env's hot loop).

Times one jitted smoke control step (RK3 advection + impulse +
divergence + Jacobi projection + gradient subtraction) at the
reference configuration (res 128^3, 50 Jacobi iters — Circulation env,
reference circulation_env.py:35-44, smoke_field.py:95-110).

Usage: python tools/bench_smoke.py [res] [jacobi_iters] [reps]
Env: BENCH_PLATFORM=cpu to force CPU.
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
    jax.config.update("jax_compilation_cache_dir", "/tmp/fluidlab_tpu_jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

    import jax.numpy as jnp

    from fluidlab_tpu.engine.config import SimCfg, SmokeCfg
    from fluidlab_tpu.engine.scene import SceneParams
    from fluidlab_tpu.engine.smoke import (
        compute_free_mask,
        init_smoke_state,
        make_smoke_step,
    )
    from fluidlab_tpu.engine.types import SimState, init_effector_state

    res = int(sys.argv[1]) if len(sys.argv) > 1 else 128
    iters = int(sys.argv[2]) if len(sys.argv) > 2 else 50
    reps = int(sys.argv[3]) if len(sys.argv) > 3 else 5
    inner = 5

    smoke_cfg = SmokeCfg(res=res, solver_iters=iters)
    cfg = SimCfg(n_particles=0, n_bodies=0, n_statics=0, smoke=smoke_cfg)
    free = compute_free_mask(smoke_cfg, [])
    params = SceneParams(smoke_free=free)
    state = SimState(
        particles=None,
        effectors=(),
        smoke=init_smoke_state(smoke_cfg),
        f_global=jnp.zeros((), jnp.int32),
    )
    step = make_smoke_step(cfg)

    @jax.jit
    def many(s):
        for _ in range(inner):
            s = step(s, params)
        return s

    t0 = time.perf_counter()
    out = jax.block_until_ready(many(state))
    print(f"compile+first: {time.perf_counter() - t0:.1f}s", flush=True)

    best = 1e9
    for _ in range(reps):
        t0 = time.perf_counter()
        out = jax.block_until_ready(many(state))
        best = min(best, (time.perf_counter() - t0) / inner)
    print(
        f"smoke step res={res} jacobi={iters}: {best * 1e3:.2f} ms/step "
        f"({1.0 / best:.1f} steps/s)",
        flush=True,
    )


if __name__ == "__main__":
    main()
