"""Standalone TPU run of the G2P Pallas kernel core (fast compile) to
isolate the faulting construct via FL_G2P_DEBUG toggles."""
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

    from fluidlab_tpu.ops.binning import compute_binning
    from fluidlab_tpu.ops.g2p_pallas import _g2p_core_impl

    dbg = os.environ.get("FL_G2P_DEBUG", "")
    N = int(os.environ.get("BISECT_N", 8192))
    G = 64
    rng = np.random.RandomState(0)
    x = rng.uniform(0.1, 0.9, size=(3, N)).astype(np.float32)
    base = np.clip((x * G - 0.5).astype(np.int32), 0, G - 3)
    w = rng.uniform(0.0, 1.0, size=(3, 3, N)).astype(np.float32)
    v_out = rng.normal(size=(3, G * G * G)).astype(np.float32)

    bn = compute_binning(jnp.asarray(base), G)

    @jax.jit
    def run(w, base, v_out):
        return _g2p_core_impl(
            w, base, v_out, bn.order, bn.valid, bn.inv, bn.starts, bn.block,
            G, 0, False, False,
        )

    S0, S1 = run(jnp.asarray(w), jnp.asarray(base), jnp.asarray(v_out))
    jax.block_until_ready((S0, S1))
    print(f"[{dbg or 'full'}] executed", flush=True)
    s0 = np.asarray(S0)
    print(f"[{dbg or 'full'}] fetched: S0 mean {s0.mean():.4f} PASS", flush=True)


if __name__ == "__main__":
    main()
