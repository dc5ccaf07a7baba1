"""Rollouts/s benchmark: multi-start planner throughput over the mesh.

Measures full MPC-iteration throughput (K rollouts fwd+bwd + best-select
+ Adam) — the BASELINE.json headline axis.

Usage: python tools/bench_rollouts.py [K] [n_particles] [horizon]
Env: BENCH_PLATFORM=cpu to force the virtual CPU mesh.
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

    import numpy as np

    from fluidlab_tpu.parallel.planner import MultiStartPlanner, make_rollout_mesh
    from fluidlab_tpu.utils.bench_scenes import liquid_agent_scene

    K = int(sys.argv[1]) if len(sys.argv) > 1 else 8
    N = int(sys.argv[2]) if len(sys.argv) > 2 else 8192
    H = int(sys.argv[3]) if len(sys.argv) > 3 else 20

    n_dev = len(jax.devices())
    mesh = make_rollout_mesh() if n_dev > 1 and K % n_dev == 0 else None
    sim = liquid_agent_scene(n_particles=N, horizon=H)
    # the flagship transfer path on TPU (bench.py defaults): regions
    # grid phase; CPU keeps the portable scatter/gather impls
    on_tpu = any(str(d).startswith("TPU") for d in jax.devices())
    p2g = os.environ.get("BENCH_P2G") or ("regions" if on_tpu else "scatter")
    g2p = os.environ.get("BENCH_G2P") or ("regions" if on_tpu else "gather")
    if (p2g, g2p) != (sim.cfg.p2g_impl, sim.cfg.g2p_impl):
        import dataclasses

        sim.cfg = dataclasses.replace(sim.cfg, p2g_impl=p2g, g2p_impl=g2p)
    print(f"transfers: {sim.cfg.p2g_impl}/{sim.cfg.g2p_impl}", flush=True)
    planner = MultiStartPlanner(
        sim, horizon_action=H, action_range=(-0.05, 0.05), n_rollouts=K,
        mesh=mesh,
    )
    v = np.zeros((H, 3), np.float32)
    p = np.full((3,), 0.5, np.float32)
    opt = planner.init_opt_state()

    t0 = time.perf_counter()
    v, p, opt, best, _ = planner.step(v, p, opt)  # compile
    t_compile = time.perf_counter() - t0

    iters = 3
    t0 = time.perf_counter()
    for _ in range(iters):
        v, p, opt, best, _ = planner.step(v, p, opt)
    dt = (time.perf_counter() - t0) / iters

    print(
        f"devices={n_dev} K={K} N={N} H={H}: "
        f"{K / dt:8.2f} rollouts/s (fwd+bwd), {dt*1e3:8.1f} ms/iter, "
        f"compile {t_compile:.0f}s, best loss {best:.4f}", flush=True,
    )


if __name__ == "__main__":
    main()
