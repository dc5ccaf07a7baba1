"""TPU probes that gate the smoke-advection kernel design:

1. does Mosaic lower jnp.take_along_axis along the LANE dim inside a
   Pallas kernel (per-lane dynamic gather)?  And along sublanes?
2. what do the XLA trilerp variants actually cost at 128^3
   (_trilerp 8-corner gathers vs _trilerp_zpair slice-gathers)?

Prints findings; exits 0 even when probes fail (failures ARE findings).
"""
import os
import sys
import time
import traceback

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    import jax

    if os.environ.get("BENCH_PLATFORM"):
        jax.config.update("jax_platforms", os.environ["BENCH_PLATFORM"])
    os.makedirs("/tmp/fluidlab_tpu_jax_cache", exist_ok=True)
    jax.config.update("jax_compilation_cache_dir",
                      "/tmp/fluidlab_tpu_jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

    import jax.numpy as jnp
    import numpy as np
    from jax.experimental import pallas as pl

    print(f"devices: {jax.devices()}", flush=True)
    interpret = jax.default_backend() != "tpu"

    # ---------------- probe 1: in-kernel lane gather
    def lane_gather_kernel(x_ref, idx_ref, o_ref):
        o_ref[...] = jnp.take_along_axis(x_ref[...], idx_ref[...], axis=1)

    def sublane_gather_kernel(x_ref, idx_ref, o_ref):
        o_ref[...] = jnp.take_along_axis(x_ref[...], idx_ref[...], axis=0)

    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.normal(size=(256, 128)), jnp.float32)
    idx = jnp.asarray(rng.randint(0, 128, size=(256, 128)), jnp.int32)
    idx0 = jnp.asarray(rng.randint(0, 256, size=(256, 128)), jnp.int32)

    for name, kern, i in (
        ("lane", lane_gather_kernel, idx),
        ("sublane", sublane_gather_kernel, idx0),
    ):
        try:
            f = pl.pallas_call(
                kern,
                out_shape=jax.ShapeDtypeStruct(x.shape, x.dtype),
                interpret=interpret,
            )
            got = jax.jit(f)(x, i)
            axis = 1 if name == "lane" else 0
            want = jnp.take_along_axis(x, i, axis=axis)
            ok = bool(jnp.all(got == want))
            print(f"probe take_along_axis[{name}]: "
                  f"{'SUPPORTED numerics=' + str(ok)}", flush=True)
        except Exception as e:
            print(f"probe take_along_axis[{name}]: UNSUPPORTED "
                  f"({type(e).__name__}: {str(e)[:200]})", flush=True)

    # ---------------- probe 1b: full-grid sublane gather (the advection
    # kernel shape: source (R^2, R) resident in VMEM, per-element row
    # gather across 16384 sublanes) + its throughput
    def big_sublane_kernel(x_ref, idx_ref, o_ref):
        o_ref[...] = jnp.take_along_axis(
            x_ref[...], idx_ref[...], axis=0
        )[: o_ref.shape[0]]

    R = 128
    xb = jnp.asarray(rng.normal(size=(R * R, R)), jnp.float32)
    ib = jnp.asarray(
        rng.randint(0, R * R, size=(R * R, R)), jnp.int32
    )
    try:
        f = pl.pallas_call(
            big_sublane_kernel,
            out_shape=jax.ShapeDtypeStruct((R * R, R), jnp.float32),
            interpret=interpret,
        )
        got = jax.block_until_ready(jax.jit(f)(xb, ib))
        want = jnp.take_along_axis(xb, ib, axis=0)
        ok = bool(jnp.all(got == want))
        t0 = time.perf_counter()
        for _ in range(10):
            got = jax.jit(f)(xb, ib)
        jax.block_until_ready(got)
        dt = (time.perf_counter() - t0) / 10
        print(f"probe big-sublane-gather (16384x128): SUPPORTED "
              f"numerics={ok} {dt*1e3:.2f} ms per 2M gather", flush=True)
    except Exception as e:
        print(f"probe big-sublane-gather: UNSUPPORTED "
              f"({type(e).__name__}: {str(e)[:200]})", flush=True)

    # ---------------- probe 2: XLA trilerp variants at 128^3
    from fluidlab_tpu.engine.smoke import _trilerp, _trilerp_zpair

    R = 128
    field = jnp.asarray(rng.normal(size=(4, R, R, R)), jnp.float32)
    ii, jj, kk = np.meshgrid(np.arange(R), np.arange(R), np.arange(R),
                             indexing="ij")
    cell = np.stack([ii, jj, kk]).astype(np.float32) + 0.5
    disp = rng.normal(scale=2.5, size=(3, R, R, R)).astype(np.float32)
    p = jnp.asarray(cell + disp)

    for name, fn in (("corner", _trilerp), ("zpair", _trilerp_zpair)):
        g = jax.jit(lambda f_, p_, fn=fn: fn(f_, p_))
        t0 = time.perf_counter()
        out = jax.block_until_ready(g(field, p))
        print(f"trilerp[{name}] compile+first {time.perf_counter()-t0:.0f}s",
              flush=True)
        t0 = time.perf_counter()
        for _ in range(10):
            out = g(field, p)
        jax.block_until_ready(out)
        dt = (time.perf_counter() - t0) / 10
        print(f"trilerp[{name}] {dt*1e3:.2f} ms per 4-channel 128^3 sample",
              flush=True)

    print("PROBE DONE", flush=True)


if __name__ == "__main__":
    main()
