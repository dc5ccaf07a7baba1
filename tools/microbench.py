"""Kernel-level microbenchmarks: isolate the substep's cost centers.

Usage: python tools/microbench.py [n_particles] [reps]
Env: BENCH_PLATFORM=cpu to force CPU.
"""

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

    import jax.numpy as jnp
    import numpy as np

    from fluidlab_tpu.core.bspline import base_and_fx, quadratic_weights
    from fluidlab_tpu.core.svd3 import svd3
    from fluidlab_tpu.ops.p2g import p2g_scatter, p2g_sort

    N = int(sys.argv[1]) if len(sys.argv) > 1 else 65536
    reps = int(sys.argv[2]) if len(sys.argv) > 2 else 20
    G = 64
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.uniform(0.1, 0.9, (N, 3)).astype(np.float32))
    feats = jnp.asarray(rng.normal(size=(N, 4)).astype(np.float32))
    F = jnp.asarray(
        (np.eye(3) + 0.01 * rng.normal(size=(N, 3, 3))).astype(np.float32)
    )
    usedf = jnp.ones((N,), jnp.float32)

    def timed(name, fn, *args, inner=10):
        @jax.jit
        def many(*a):
            out = None
            acc = 0.0
            for _ in range(inner):
                out = fn(*a)
                acc = acc + jnp.sum(out[0] if isinstance(out, tuple) else out)
            return acc

        r = many(*args)
        jax.block_until_ready(r)
        t0 = time.perf_counter()
        for _ in range(reps):
            r = many(*args)
        jax.block_until_ready(r)
        dt = (time.perf_counter() - t0) / (reps * inner)
        print(f"{name:24s} {dt * 1e3:9.3f} ms/call", flush=True)
        return dt

    base, fx = base_and_fx(x, float(G))
    base = jnp.clip(base, 0, G - 3)
    w = quadratic_weights(fx)

    def scatter_op(base, w, feats, usedf):
        return p2g_scatter(base, w, feats, usedf, G)

    def sort_op(base, w, feats, usedf):
        return p2g_sort(base, w, feats, usedf, G)

    def gather_op(base, w):
        grid = jnp.ones((G * G * G, 3), jnp.float32)
        acc = jnp.zeros((N, 3), jnp.float32)
        for oi in range(3):
            for oj in range(3):
                for ok in range(3):
                    wi = w[:, oi, 0] * w[:, oj, 1] * w[:, ok, 2]
                    idx = (
                        (base[:, 0] + oi) * (G * G)
                        + (base[:, 1] + oj) * G
                        + (base[:, 2] + ok)
                    )
                    acc = acc + wi[:, None] * grid[idx]
        return acc

    def svd_op(F):
        U, s, V = svd3(F)
        return U

    def weights_op(x):
        b, f = base_and_fx(x, float(G))
        return quadratic_weights(f)

    timed("p2g_scatter", scatter_op, base, w, feats, usedf)
    timed("p2g_sort", sort_op, base, w, feats, usedf)
    timed("g2p_gather", gather_op, base, w)
    timed("svd3", svd_op, F)
    timed("bspline_weights", weights_op, x)


if __name__ == "__main__":
    main()
