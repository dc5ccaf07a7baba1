"""Time ablated variants of the P2G Pallas kernel to find its cost
center (~12 of 20.5 ms/substep @65k — RESULTS.md).

Variants (FL_P2G_VARIANTS=comma list, default all):
  full     production _p2g_core_impl (binning outside, pack+kernel+overlap)
  kernel   pallas accumulate only, pre-packed input
  noconstr matmul+pipeline, T/W2 replaced by cheap broadcasts
  nomm     construction+pipeline, big matmul replaced by cheap add
  empty    pipeline only: zero acc, write out per block
  bf16mm   construction + bf16-input matmul (f32 accumulate)

Usage: python tools/tpu_p2g_bisect.py [N] [reps]
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    import jax
    import jax.numpy as jnp
    import numpy as np
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    if os.environ.get("BENCH_PLATFORM"):
        jax.config.update("jax_platforms", os.environ["BENCH_PLATFORM"])
    os.makedirs("/tmp/fluidlab_tpu_jax_cache", exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", "/tmp/fluidlab_tpu_jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

    from fluidlab_tpu.ops import p2g_pallas as P
    from fluidlab_tpu.ops.binning import BLOCK, chunk_to_block, compute_binning

    N = int(sys.argv[1]) if len(sys.argv) > 1 else 65536
    reps = int(sys.argv[2]) if len(sys.argv) > 2 else 5
    inner = 20
    G = 64
    nb = G // BLOCK
    m = int(os.environ.get("FL_M", "0"))
    region = P._region(m)
    r2 = region * region
    r2pad = P._r2pad(m)
    wcols = region * P.CPAD
    CHUNK, PACK, CPAD = P.CHUNK, P.PACK, P.CPAD

    rng = np.random.RandomState(0)
    x = rng.uniform(0.1, 0.9, size=(3, N)).astype(np.float32)
    base = np.clip((x * G - 0.5).astype(np.int32), 0, G - 3)
    w = rng.uniform(0.0, 1.0, size=(3, 3, N)).astype(np.float32)
    feats = rng.normal(size=(13, N)).astype(np.float32)
    bn = compute_binning(jnp.asarray(base), G)

    # pre-packed rows (as in _p2g_core_impl)
    from fluidlab_tpu.ops.binning import pack_rows

    lb = (jnp.asarray(base) - bn.block * BLOCK + m).astype(jnp.float32)
    rows = jnp.concatenate(
        [jnp.asarray(w[:, 0]), jnp.asarray(w[:, 1]), jnp.asarray(w[:, 2]),
         lb, jnp.asarray(feats)], axis=0)
    rows = pack_rows(rows, bn.order, bn.inv)
    rows = jnp.concatenate([rows[:3] * bn.valid[None, :], rows[3:]], axis=0)
    rows = jnp.pad(rows, ((0, PACK - 25), (0, 0)))
    packed = jnp.asarray(rows.T)  # (NPAD, PACK)
    c2b = chunk_to_block(bn.starts, packed.shape[0])
    nch = packed.shape[0] // CHUNK
    print(f"N={N} NPAD={packed.shape[0]} nch={nch} r2pad={r2pad} "
          f"wcols={wcols} m={m}", flush=True)

    def make_variant(mode):
        def kernel(c2b_ref, packed_ref, out_ref, acc_ref):
            i = pl.program_id(0)
            nprog = pl.num_programs(0)
            first = jnp.where(
                i == 0, True, c2b_ref[i] != c2b_ref[jnp.maximum(i - 1, 0)])
            last = jnp.where(
                i == nprog - 1, True,
                c2b_ref[i] != c2b_ref[jnp.minimum(i + 1, nprog - 1)])

            @pl.when(first)
            def _():
                acc_ref[...] = jnp.zeros_like(acc_ref)

            pk = packed_ref[...]
            if mode == "empty":
                pass
            else:
                if mode == "noconstr":
                    # keep matmul shapes; skip one-hot construction
                    T = jnp.broadcast_to(pk[:, 0:1], (CHUNK, r2pad))
                    W2 = jnp.broadcast_to(pk[:, 1:2], (CHUNK, wcols))
                else:
                    col = jax.lax.broadcasted_iota(
                        jnp.int32, (CHUNK, r2pad), 1)
                    a_col = jnp.minimum(col // region, region - 1)
                    b_col = col % region
                    col_valid = (col < r2).astype(jnp.float32)
                    wcol = jax.lax.broadcasted_iota(
                        jnp.int32, (CHUNK, wcols), 1)
                    c_wcol = wcol // CPAD
                    p_rows = jax.lax.broadcasted_iota(
                        jnp.int32, (CPAD, wcols), 0)
                    p_cols = jax.lax.broadcasted_iota(
                        jnp.int32, (CPAD, wcols), 1)
                    p_tile = (p_cols % CPAD == p_rows).astype(jnp.float32)
                    wvals = (pk[:, 0:3], pk[:, 3:6], pk[:, 6:9])
                    lvals = pk[:, 9:12].astype(jnp.int32)
                    fvals = pk[:, 12:12 + CPAD]

                    def onehot_w(w_axis, lb_, cell_ids):
                        off = cell_ids - lb_
                        out = jnp.zeros(cell_ids.shape, jnp.float32)
                        for o in range(3):
                            out = out + jnp.where(
                                off == o, w_axis[:, o:o + 1], 0.0)
                        return out

                    T = (onehot_w(wvals[0], lvals[:, 0:1], a_col)
                         * onehot_w(wvals[1], lvals[:, 1:2], b_col)
                         * col_valid)
                    feats_tiled = jax.lax.dot_general(
                        fvals, p_tile, (((1,), (0,)), ((), ())),
                        preferred_element_type=jnp.float32)
                    W2 = onehot_w(wvals[2], lvals[:, 2:3], c_wcol) * feats_tiled

                if mode == "nomm":
                    # consume T and W2 without the big matmul
                    acc_ref[...] += (
                        jnp.broadcast_to(
                            jnp.sum(T, axis=0)[:, None], (r2pad, wcols))
                        + jnp.broadcast_to(
                            jnp.sum(W2, axis=0)[None, :], (r2pad, wcols))
                    )
                elif mode == "bf16mm":
                    acc_ref[...] += jax.lax.dot_general(
                        T.astype(jnp.bfloat16), W2.astype(jnp.bfloat16),
                        (((0,), (0,)), ((), ())),
                        preferred_element_type=jnp.float32,
                        precision=jax.lax.Precision.DEFAULT)
                else:
                    acc_ref[...] += jax.lax.dot_general(
                        T, W2, (((0,), (0,)), ((), ())),
                        preferred_element_type=jnp.float32)

            @pl.when(last)
            def _():
                out_ref[0] = acc_ref[...]

        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(nch,),
            in_specs=[pl.BlockSpec((CHUNK, PACK), lambda i, c2b: (i, 0))],
            out_specs=pl.BlockSpec(
                (1, r2pad, wcols), lambda i, c2b: (c2b[i], 0, 0)),
            scratch_shapes=[pltpu.VMEM((r2pad, wcols), jnp.float32)],
        )

        on_tpu = any(str(d).startswith("TPU") for d in jax.devices())

        def run_once(pk_in):
            call = lambda: pl.pallas_call(
                kernel,
                out_shape=jax.ShapeDtypeStruct(
                    (nb * nb * nb, r2pad, wcols), jnp.float32),
                grid_spec=grid_spec,
            )(c2b, pk_in)
            if on_tpu:
                return call()
            with pltpu.force_tpu_interpret_mode():
                return call()

        @jax.jit
        def chained(pk_in):
            def body(carry, _):
                out = run_once(carry)
                # data-dependence so XLA can't CSE/elide iterations
                carry = carry + out[0, 0, 0] * 1e-30
                return carry, ()
            carry, _ = jax.lax.scan(body, pk_in, None, length=inner)
            return carry
        return chained

    variants = os.environ.get(
        "FL_P2G_VARIANTS", "kernel,noconstr,nomm,empty,bf16mm,full"
    ).split(",")

    for mode in variants:
        if mode == "full":
            from fluidlab_tpu.ops.p2g_pallas import _p2g_core_impl

            @jax.jit
            def chained(w_, base_, feats_):
                def body(carry, _):
                    out = _p2g_core_impl(
                        w_, base_, carry, bn.order, bn.valid, bn.inv,
                        bn.starts, bn.block, G, m, False, False)
                    return feats_ + out[0, 0] * 1e-30, ()
                carry, _ = jax.lax.scan(
                    body, feats_, None, length=inner)
                return carry
            args = (jnp.asarray(w), jnp.asarray(base), jnp.asarray(feats))
        else:
            chained = make_variant(mode)
            args = (packed,)

        r = jax.block_until_ready(chained(*args))  # compile
        ts = []
        for _ in range(reps):
            t0 = time.perf_counter()
            jax.block_until_ready(chained(*args))
            ts.append((time.perf_counter() - t0) / inner)
        best = min(ts) * 1e3
        print(f"{mode:10s} {best:8.3f} ms/call  ({best * 1e3 / nch:6.2f} "
              f"us/program)", flush=True)


if __name__ == "__main__":
    main()
