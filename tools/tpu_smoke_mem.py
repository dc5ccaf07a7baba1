"""Compile-only memory diagnosis of the smoke step on TPU.

Queue r5 found the 128^3 smoke benchmark (5 unrolled steps, 50 Jacobi
iters) OOMs the 16G v5e at COMPILE time (16.17G of 15.75G hbm).  This
lowers + compiles (no execution) single and 5-step variants and prints
the compiler's memory analysis to find what the buffer plan keeps live.
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    import jax

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

    print(f"devices: {jax.devices()}", flush=True)

    def probe(tag, res, inner, iters=50):
        smoke_cfg = SmokeCfg(res=res, solver_iters=iters)
        cfg = SimCfg(n_particles=0, n_bodies=0, n_statics=0, smoke=smoke_cfg)
        params = SceneParams(smoke_free=compute_free_mask(smoke_cfg, []))
        state = SimState(particles=None, effectors=(),
                         smoke=init_smoke_state(smoke_cfg),
                         f_global=jnp.zeros((), jnp.int32))
        step = make_smoke_step(cfg)

        def many(s):
            for _ in range(inner):
                s = step(s, params)
            return s

        t0 = time.perf_counter()
        try:
            compiled = jax.jit(many).lower(state).compile()
        except Exception as e:  # noqa: BLE001
            print(f"[{tag}] COMPILE FAILED ({time.perf_counter()-t0:.0f}s): "
                  f"{str(e)[:300]}", flush=True)
            return
        ma = compiled.memory_analysis()
        print(f"[{tag}] compiled in {time.perf_counter()-t0:.0f}s: {ma}",
              flush=True)

    probe("res128/inner1", 128, 1)
    probe("res128/inner5", 128, 5)
    probe("res96/inner5", 96, 5)
    print("SMOKE MEM DONE", flush=True)


if __name__ == "__main__":
    main()
