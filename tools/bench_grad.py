"""Differentiable-rollout (fwd+bwd) timing: the solver-loop inner cost.

Times one jitted value_and_grad over an H-step checkpointed rollout of
the flagship liquid scene (loss = velocity energy + position L1) —
i.e., what each trajectory-optimization iteration pays per horizon
window.  Usage: python tools/bench_grad.py [N] [H] [impl]
impl: portable | pallas (default pallas on TPU).
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

    import dataclasses

    import jax.numpy as jnp

    from fluidlab_tpu.engine.mpm import make_step
    from fluidlab_tpu.engine.rollout import checkpointed_scan
    from fluidlab_tpu.utils.bench_scenes import liquid_block_scene

    N = int(sys.argv[1]) if len(sys.argv) > 1 else 65536
    H = int(sys.argv[2]) if len(sys.argv) > 2 else 5
    on_tpu = any(str(d).startswith("TPU") for d in jax.devices())
    impl = sys.argv[3] if len(sys.argv) > 3 else (
        "pallas" if on_tpu else "portable"
    )

    cfg, params, state = liquid_block_scene(n_particles=N, horizon=H)
    if impl == "pallas":
        cfg = dataclasses.replace(cfg, p2g_impl="pallas", g2p_impl="pallas")
    elif impl == "regions":
        cfg = dataclasses.replace(cfg, p2g_impl="regions", g2p_impl="regions")
    # FL_BINMODE=step[:margin] -> persistent once-per-step binning
    bm = os.environ.get("FL_BINMODE")
    if bm:
        parts = bm.split(":")
        cfg = dataclasses.replace(
            cfg, binning_mode=parts[0],
            binning_margin=int(parts[1]) if len(parts) > 1 else 2,
        )
    step = make_step(cfg)
    ha = jnp.asarray(False)

    # differentiate w.r.t. the initial velocity: a real gradient path
    # through every substep (this scene has no agent, so action grads
    # would be identically zero and XLA would eliminate the backward)
    def loss_fn(v0, s0):
        s0 = s0.replace(particles=s0.particles.replace(v=v0))

        def body(s, a):
            s1 = step(s, params, a, ha)
            return s1, jnp.sum(s1.particles.v ** 2)
        actions = jnp.zeros((H, 1), jnp.float32)
        window = int(os.environ.get("FL_WINDOW", "5"))
        sH, per_step = checkpointed_scan(body, s0, actions, window=window)
        return jnp.sum(per_step) + jnp.sum(jnp.abs(sH.particles.x))

    vg = jax.jit(jax.value_and_grad(loss_fn))

    if os.environ.get("FL_MEMSTATS"):
        # compiled memory analysis BEFORE the first run: if the run then
        # crashes the worker, the budget numbers are already printed
        # (the round-2 crash discriminator, RESULTS.md)
        lowered = vg.lower(state.particles.v, state)
        compiled = lowered.compile()
        ma = compiled.memory_analysis()
        if ma is not None:
            for k in (
                "temp_size_in_bytes", "argument_size_in_bytes",
                "output_size_in_bytes", "alias_size_in_bytes",
                "generated_code_size_in_bytes",
            ):
                v = getattr(ma, k, None)
                if v is not None:
                    print(f"memstats {k}: {v / 1e9:.3f} GB", flush=True)

    t0 = time.perf_counter()
    val, g = vg(state.particles.v, state)
    jax.block_until_ready((val, g))
    print(f"compile+first: {time.perf_counter() - t0:.1f}s "
          f"loss={float(val):.3f}", flush=True)

    trace_dir = os.environ.get("FL_TRACE")
    if trace_dir:
        os.system(f"rm -rf {trace_dir}")
        with jax.profiler.trace(trace_dir):
            val, g = vg(state.particles.v, state)
            jax.block_until_ready((val, g))
        print("trace captured to", trace_dir, flush=True)

    reps = 3
    t0 = time.perf_counter()
    for _ in range(reps):
        val, g = vg(state.particles.v, state)
    jax.block_until_ready((val, g))
    dt = (time.perf_counter() - t0) / reps
    per_substep = dt / (H * cfg.n_substeps)
    print(
        f"fwd+bwd[{impl}] H={H} N={N}: {dt * 1e3:.1f} ms/iter "
        f"({per_substep * 1e3:.2f} ms/substep fwd+bwd, "
        f"{H * cfg.n_substeps / dt:.1f} substeps/s)",
        flush=True,
    )


if __name__ == "__main__":
    main()
