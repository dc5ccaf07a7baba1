"""Time the real substep/step functions with chained (non-CSE-able)
state, plus ablations to find the cost center."""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    platform = os.environ.get("BENCH_PLATFORM")
    import jax

    if platform:
        jax.config.update("jax_platforms", platform)
    os.makedirs("/tmp/fluidlab_tpu_jax_cache", exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", "/tmp/fluidlab_tpu_jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

    import dataclasses

    import jax.numpy as jnp
    import numpy as np

    from fluidlab_tpu.engine.mpm import make_substep
    from fluidlab_tpu.utils.bench_scenes import liquid_block_scene

    N = int(sys.argv[1]) if len(sys.argv) > 1 else 65536
    reps = int(sys.argv[2]) if len(sys.argv) > 2 else 5
    inner = 10

    impls = (sys.argv[3].split(",") if len(sys.argv) > 3
             else ["scatter", "sort"])

    for impl in impls:
        cfg, params, state = liquid_block_scene(n_particles=N, horizon=10)
        if impl == "pallas2":  # both transfers via pallas kernels
            cfg = dataclasses.replace(
                cfg, p2g_impl="pallas", g2p_impl="pallas"
            )
        elif impl == "pallas2m2":  # exact binning, widened (m=2) regions
            cfg = dataclasses.replace(
                cfg, p2g_impl="pallas", g2p_impl="pallas", binning_margin=2
            )
        elif impl == "persist":  # pallas2 + once-per-step binning
            cfg = dataclasses.replace(
                cfg, p2g_impl="pallas", g2p_impl="pallas",
                binning_mode="step", binning_margin=2,
            )
        else:
            cfg = dataclasses.replace(cfg, p2g_impl=impl)

        if impl == "persist":
            from fluidlab_tpu.engine.mpm import make_step

            stepfn = make_step(cfg)
            act = jnp.zeros((1,), jnp.float32)

            @jax.jit
            def chain(s):
                return stepfn(s, params, act, jnp.asarray(False))
        else:
            substep = make_substep(cfg)

            @jax.jit
            def chain(s):
                def body(carry, _):
                    return substep(carry, params, jnp.asarray(False)), None

                out, _ = jax.lax.scan(body, s, None, length=inner)
                return out

        if os.environ.get("BENCH_COST"):
            try:
                ca = jax.jit(chain).lower(state).compile().cost_analysis()
                if isinstance(ca, list):
                    ca = ca[0]
                big = {
                    k: round(v / 1e9, 3)
                    for k, v in ca.items()
                    if isinstance(v, float) and v > 1e8
                }
                print(f"cost[{impl}] (GB/Gflop):", big, flush=True)
            except Exception as e:
                print("cost_analysis failed:", e, flush=True)

        s1 = chain(state)
        jax.block_until_ready(s1)
        t0 = time.perf_counter()
        s = s1
        for _ in range(reps):
            s = chain(s)
        # checksum forces real materialization (guards against lazy /
        # eliminated computation skewing the timing)
        csum = float(jnp.sum(s.particles.v)) + float(jnp.sum(s.particles.x))
        dt = (time.perf_counter() - t0) / (reps * inner)
        tag = os.environ.get("FL_ABLATE", "")
        print(f"substep[{impl:8s}{('|' + tag) if tag else ''}] "
              f"{dt * 1e3:9.3f} ms  ({1.0 / dt:8.1f} substeps/s)  "
              f"csum={csum:.4f}", flush=True)


if __name__ == "__main__":
    main()
