"""Headline benchmark: MLS-MPM substeps/s/chip.

Runs the flagship physics core (64^3 grid, 64k particles, 10 substeps per
control step — the LatteArt-scale configuration, reference
mpm_simulator.py:21-30) and reports simulation throughput.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

Baseline: the reference publishes no numbers (BASELINE.md); we normalize
against 1000 substeps/s, a representative single-GPU Taichi MLS-MPM rate
at this particle count (consumer-GPU era of the reference), so
vs_baseline = value / 1000.
"""

import json
import os
import sys
import time


def main():
    platform = os.environ.get("BENCH_PLATFORM")
    if platform:
        import jax

        jax.config.update("jax_platforms", platform)
    import jax
    import jax.numpy as jnp

    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    from fluidlab_tpu.engine.mpm import make_step
    from fluidlab_tpu.utils.bench_scenes import liquid_block_scene

    os.makedirs("/tmp/fluidlab_tpu_jax_cache", exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", "/tmp/fluidlab_tpu_jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

    n_particles = int(os.environ.get("BENCH_PARTICLES", 65536))
    n_steps = int(os.environ.get("BENCH_STEPS", 25))
    cfg, params, state = liquid_block_scene(
        n_particles=n_particles, horizon=10
    )
    on_tpu = any(str(d).startswith("TPU") for d in jax.devices())
    p2g = os.environ.get("BENCH_P2G") or ("regions" if on_tpu else "scatter")
    g2p = os.environ.get("BENCH_G2P") or ("regions" if on_tpu else "gather")
    # binning mode: 'substep' (exact, fastest measured so far) or 'step'
    # (persistent once-per-step binning — currently slower on TPU, see
    # RESULTS.md; flip via BENCH_BINNING once the regression is fixed)
    bmode = os.environ.get("BENCH_BINNING") or "substep"
    import dataclasses

    cfg = dataclasses.replace(
        cfg, p2g_impl=p2g, g2p_impl=g2p, binning_mode=bmode,
        binning_margin=int(os.environ.get("BENCH_MARGIN") or 2)
        if bmode == "step" else 0,
    )
    step = make_step(cfg)
    action = jnp.zeros((1,), jnp.float32)
    has_action = jnp.asarray(False)

    # one dispatch covers n_steps control steps: measures device
    # throughput, not host/tunnel round-trip latency
    @jax.jit
    def roll(s):
        def body(carry, _):
            return step(carry, params, action, has_action), None

        out, _ = jax.lax.scan(body, s, None, length=n_steps)
        return out

    s1 = roll(state)  # compile + warmup
    jax.block_until_ready(s1)

    reps = int(os.environ.get("BENCH_REPS", 3))
    t0 = time.perf_counter()
    s = s1
    for _ in range(reps):
        s = roll(s)
    jax.block_until_ready(s)
    dt = time.perf_counter() - t0

    substeps = n_steps * cfg.n_substeps * reps
    substeps_per_s = substeps / dt
    baseline = 1000.0
    print(
        json.dumps(
            {
                "metric": "mpm_substeps_per_s_per_chip",
                "value": round(substeps_per_s, 2),
                "unit": f"substeps/s @ {n_particles} particles, 64^3 grid",
                "vs_baseline": round(substeps_per_s / baseline, 3),
            }
        )
    )


if __name__ == "__main__":
    main()
