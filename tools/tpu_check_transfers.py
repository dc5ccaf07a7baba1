"""On-device numerical check of the Pallas transfer kernels vs the
scatter/gather reference path (run on real TPU; the microbenches only
time, they don't validate)."""
import dataclasses
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    import jax
    import jax.numpy as jnp
    import numpy as np

    os.makedirs("/tmp/fluidlab_tpu_jax_cache", exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", "/tmp/fluidlab_tpu_jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

    from fluidlab_tpu.engine.mpm import make_step
    from fluidlab_tpu.utils.bench_scenes import liquid_block_scene

    N = int(os.environ.get("CHECK_PARTICLES", 8192))
    cfg, params, state = liquid_block_scene(n_particles=N, horizon=10)
    a = jnp.zeros((1,), jnp.float32)
    ha = jnp.asarray(False)

    variants = {
        "ref": cfg,
        "pallas2": dataclasses.replace(cfg, p2g_impl="pallas", g2p_impl="pallas"),
        "persist": dataclasses.replace(
            cfg, p2g_impl="pallas", g2p_impl="pallas",
            binning_mode="step", binning_margin=2,
        ),
        "regions": dataclasses.replace(
            cfg, p2g_impl="regions", g2p_impl="regions"
        ),
    }
    outs = {}
    for name, c in variants.items():
        step = jax.jit(make_step(c))
        s = state
        for _ in range(2):
            s = step(s, params, a, ha)
        jax.block_until_ready(s)
        outs[name] = s
        print(f"{name}: ran", flush=True)

    ref = outs["ref"]
    ok = True
    for name in ("pallas2", "persist", "regions"):
        s = outs[name]
        for f in ("x", "v", "C", "F"):
            d = np.abs(
                np.asarray(getattr(s.particles, f))
                - np.asarray(getattr(ref.particles, f))
            ).max()
            tol = {"x": 2e-6, "v": 1e-4, "C": 3e-2, "F": 1e-5}[f]
            flag = "OK" if d < tol else "FAIL"
            if d >= tol:
                ok = False
            print(f"{name} {f} maxdiff {d:.3e} [{flag}]", flush=True)
    print("TPU TRANSFER CHECK:", "PASS" if ok else "FAIL")


if __name__ == "__main__":
    main()
