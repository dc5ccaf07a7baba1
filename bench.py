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

    n_particles = int(os.environ.get("BENCH_PARTICLES", 65536))
    cfg, params, state = liquid_block_scene(
        n_particles=n_particles, horizon=10
    )
    step = jax.jit(make_step(cfg))
    action = jnp.zeros((1,), jnp.float32)
    has_action = jnp.asarray(False)

    # compile + warmup
    state1 = step(state, params, action, has_action)
    jax.block_until_ready(state1)

    # timed: chain of control steps (10 substeps each)
    n_steps = int(os.environ.get("BENCH_STEPS", 100))
    s = state
    t0 = time.perf_counter()
    for _ in range(n_steps):
        s = step(s, params, action, has_action)
    jax.block_until_ready(s)
    dt = time.perf_counter() - t0

    substeps = n_steps * cfg.n_substeps
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
