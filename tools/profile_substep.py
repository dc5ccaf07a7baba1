"""Capture a jax profiler trace of the substep chain and print the top
device ops from the xplane."""

import glob
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    import jax

    if os.environ.get("BENCH_PLATFORM"):
        jax.config.update("jax_platforms", os.environ["BENCH_PLATFORM"])
    os.makedirs("/tmp/fluidlab_tpu_jax_cache", exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", "/tmp/fluidlab_tpu_jax_cache")

    import dataclasses

    import jax.numpy as jnp

    from fluidlab_tpu.engine.mpm import make_substep
    from fluidlab_tpu.utils.bench_scenes import liquid_block_scene

    N = int(sys.argv[1]) if len(sys.argv) > 1 else 65536
    impl = sys.argv[2] if len(sys.argv) > 2 else "scatter"
    cfg, params, state = liquid_block_scene(n_particles=N, horizon=10)
    if impl == "pallas2":  # both transfers via the pallas kernels
        cfg = dataclasses.replace(cfg, p2g_impl="pallas", g2p_impl="pallas")
    elif impl == "regions":  # region-space grid phase
        cfg = dataclasses.replace(cfg, p2g_impl="regions", g2p_impl="regions")
    else:
        cfg = dataclasses.replace(cfg, p2g_impl=impl)
    substep = make_substep(cfg)

    @jax.jit
    def chain(s):
        def body(carry, _):
            return substep(carry, params, jnp.asarray(False)), None

        out, _ = jax.lax.scan(body, s, None, length=10)
        return out

    s1 = chain(state)
    jax.block_until_ready(s1)

    trace_dir = "/tmp/fluidlab_trace"
    os.system(f"rm -rf {trace_dir}")
    with jax.profiler.trace(trace_dir):
        s2 = chain(s1)
        jax.block_until_ready(s2)
    print("trace captured", flush=True)

    # summarize the xplane
    files = glob.glob(f"{trace_dir}/**/*.xplane.pb", recursive=True)
    print("xplane files:", files, flush=True)
    if files:
        try:
            from tensorboard_plugin_profile.convert import raw_to_tool_data as r2t

            data, _ = r2t.xspace_to_tool_data(files, "op_profile", {})
            out = "/tmp/fluidlab_trace/op_profile.json"
            with open(out, "wb") as f:
                f.write(data if isinstance(data, bytes) else data.encode())
            print("op_profile written to", out, flush=True)
        except Exception as e:
            print("tool convert failed:", e, flush=True)


if __name__ == "__main__":
    main()
