"""Batched TPU measurement: several configs in ONE process.

The axon tunnel wedges ~50% of processes at backend init, so per-config
processes waste retries; this runs the full measurement matrix after a
single successful init.  Each line prints as soon as measured, so a
killed run still yields partial data (and every compiled program lands
in the persistent cache for the retry).

Configs (all regions impl, 64^3 grid, N=65536 unless FL_BATCH_N):
  fwd/substep      bench.py official forward (exact substep binning)
  fwd/step:m       persistent binning, margin m in FL_BATCH_MARGINS
  grad/w0, grad/w5 fwd+bwd H=5, remat window 0 / 5
  smoke            SmokeField control step (128^3, 50 Jacobi iters)

Select with FL_BATCH=comma list (default: all).
"""
import dataclasses
import os
import sys
import time

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

    from fluidlab_tpu.engine.mpm import make_step
    from fluidlab_tpu.engine.rollout import checkpointed_scan
    from fluidlab_tpu.utils.bench_scenes import liquid_block_scene

    N = int(os.environ.get("FL_BATCH_N", 65536))
    margins = [int(x) for x in
               os.environ.get("FL_BATCH_MARGINS", "1,2").split(",")]
    which = os.environ.get("FL_BATCH", "").split(",") if \
        os.environ.get("FL_BATCH") else None

    def want(name):
        return which is None or any(name.startswith(w) for w in which)

    print(f"devices: {jax.devices()}", flush=True)

    def fwd_run(tag, bmode, margin, **cfg_extra):
        n_steps, reps = 25, 3
        cfg, params, state = liquid_block_scene(n_particles=N, horizon=10)
        cfg = dataclasses.replace(
            cfg, p2g_impl="regions", g2p_impl="regions",
            binning_mode=bmode, binning_margin=margin, **cfg_extra,
        )
        step = make_step(cfg)
        action = jnp.zeros((1,), jnp.float32)
        ha = jnp.asarray(False)

        @jax.jit
        def roll(s):
            def body(carry, _):
                return step(carry, params, action, ha), None
            out, _ = jax.lax.scan(body, s, None, length=n_steps)
            return out

        t0 = time.perf_counter()
        s1 = roll(state)
        jax.block_until_ready(s1)
        print(f"[{tag}] compile+first {time.perf_counter() - t0:.0f}s",
              flush=True)
        t0 = time.perf_counter()
        s = s1
        for _ in range(reps):
            s = roll(s)
        jax.block_until_ready(s)
        dt = time.perf_counter() - t0
        sub = n_steps * cfg.n_substeps * reps
        print(f"[{tag}] {sub / dt:.1f} substeps/s "
              f"({dt / sub * 1e3:.2f} ms/substep)", flush=True)

    def grad_run(tag, window, **cfg_extra):
        H = 5
        cfg, params, state = liquid_block_scene(n_particles=N, horizon=H)
        cfg = dataclasses.replace(cfg, p2g_impl="regions",
                                  g2p_impl="regions", **cfg_extra)
        step = make_step(cfg)
        ha = jnp.asarray(False)

        def loss_fn(v0, s0):
            s0 = s0.replace(particles=s0.particles.replace(v=v0))

            def body(s, a):
                s1 = step(s, params, a, ha)
                return s1, jnp.sum(s1.particles.v ** 2)
            actions = jnp.zeros((H, 1), jnp.float32)
            sH, per = checkpointed_scan(body, s0, actions, window=window)
            return jnp.sum(per) + jnp.sum(jnp.abs(sH.particles.x))

        vg = jax.jit(jax.value_and_grad(loss_fn))
        t0 = time.perf_counter()
        val, g = vg(state.particles.v, state)
        jax.block_until_ready((val, g))
        print(f"[{tag}] compile+first {time.perf_counter() - t0:.0f}s "
              f"loss={float(val):.3f}", flush=True)
        reps = 3
        t0 = time.perf_counter()
        for _ in range(reps):
            val, g = vg(state.particles.v, state)
        jax.block_until_ready((val, g))
        dt = (time.perf_counter() - t0) / reps
        per = dt / (H * cfg.n_substeps)
        print(f"[{tag}] {per * 1e3:.2f} ms/substep fwd+bwd "
              f"({H * cfg.n_substeps / dt:.1f} substeps/s)", flush=True)

    def smoke_run(tag, res=128, iters=50, impl=None, grad=False,
                  inner=None):
        from fluidlab_tpu.engine.config import SimCfg, SmokeCfg
        from fluidlab_tpu.engine.scene import SceneParams
        from fluidlab_tpu.engine.smoke import (
            compute_free_mask,
            init_smoke_state,
            make_smoke_step,
        )
        from fluidlab_tpu.engine.types import SimState

        smoke_cfg = SmokeCfg(res=res, solver_iters=iters)
        cfg = SimCfg(n_particles=0, n_bodies=0, n_statics=0,
                     smoke=smoke_cfg)
        params = SceneParams(smoke_free=compute_free_mask(smoke_cfg, []))
        state = SimState(particles=None, effectors=(),
                         smoke=init_smoke_state(smoke_cfg),
                         f_global=jnp.zeros((), jnp.int32))
        prev_impl = os.environ.get("FL_SMOKE_IMPL")
        if impl is not None:
            os.environ["FL_SMOKE_IMPL"] = impl
        try:
            step = make_smoke_step(cfg)
        finally:
            if impl is not None:
                if prev_impl is None:
                    del os.environ["FL_SMOKE_IMPL"]
                else:
                    os.environ["FL_SMOKE_IMPL"] = prev_impl
        # amortize the remote tunnel's ~24 ms dispatch round-trip (r2
        # trace: 5-step dispatches over-reported 3.1 ms/step as 7.87)
        if inner is None:
            # amortize the ~24 ms tunnel dispatch RTT; the XLA stencil
            # path compile-OOMs past ~5 unrolled 128^3 steps (r5), so
            # non-pallas legs pass inner=5 explicitly
            inner = 6 if grad else 20

        if grad:
            def loss(v0, s):
                st = s.replace(smoke=s.smoke.replace(v=v0))
                for _ in range(inner):
                    st = step(st, params)
                return (jnp.sum(jnp.abs(st.smoke.v))
                        + jnp.sum(st.smoke.q ** 2))

            vg = jax.jit(jax.value_and_grad(loss))

            def many(s):
                return vg(s.smoke.v, s)
        else:
            @jax.jit
            def many(s):
                for _ in range(inner):
                    s = step(s, params)
                return s

        t0 = time.perf_counter()
        out = jax.block_until_ready(many(state))
        print(f"[{tag}] compile+first {time.perf_counter() - t0:.0f}s",
              flush=True)
        best = 1e9
        for _ in range(3):
            t0 = time.perf_counter()
            out = jax.block_until_ready(many(state))
            best = min(best, (time.perf_counter() - t0) / inner)
        del out
        print(f"[{tag}] {best * 1e3:.2f} ms/step ({1.0 / best:.1f} "
              f"steps/s) res={res} jacobi={iters} "
              f"{'fwd+bwd' if grad else 'fwd'}", flush=True)

    if want("fwd/substep"):
        fwd_run("fwd/substep", "substep", 0)
    if want("fwd/withsvd"):
        # isolate the inviscid-liquid SVD elision (bench scene default
        # is all_inviscid_liquid=True)
        fwd_run("fwd/withsvd", "substep", 0, all_inviscid_liquid=False)
    for prec in os.environ.get("FL_BATCH_DOTPREC", "").split(","):
        # FL_DOT_PREC sweep: env is read lazily (lru_cached) at kernel
        # trace time, so clearing the cache + retracing picks it up.
        if prec and want(f"fwd/dot:{prec}"):
            from fluidlab_tpu.ops.masks import dot_prec
            os.environ["FL_DOT_PREC"] = prec
            dot_prec.cache_clear()
            fwd_run(f"fwd/dot:{prec}", "substep", 0)
            del os.environ["FL_DOT_PREC"]
            dot_prec.cache_clear()
    for m in margins:
        if want(f"fwd/step:{m}"):
            fwd_run(f"fwd/step:{m}", "step", m)
    if want("grad/w0"):
        grad_run("grad/w0", 0)
    if want("grad/w5"):
        grad_run("grad/w5", 5)
    if want("grad/withsvd"):
        # isolate the round-4 inviscid-liquid SVD elision in the backward
        grad_run("grad/withsvd", 0, all_inviscid_liquid=False)
    for prec in os.environ.get("FL_BATCH_MASKDOT", "").split(","):
        # split precision: mask contractions at `prec`, accumulate dots
        # at the process-level FL_DOT_PREC (unset = full f32)
        if prec and want(f"maskdot:{prec}"):
            from fluidlab_tpu.ops.masks import mask_dot_prec
            os.environ["FL_MASK_DOT_PREC"] = prec
            mask_dot_prec.cache_clear()
            fwd_run(f"fwd/maskdot:{prec}", "substep", 0)
            grad_run(f"grad/maskdot:{prec}", 0, all_inviscid_liquid=False)
            del os.environ["FL_MASK_DOT_PREC"]
            mask_dot_prec.cache_clear()
    for ev in os.environ.get("FL_BATCH_ELIDE", "").split(","):
        # SVD-elision variant bisection (SimCfg.elide_variant)
        if ev and want(f"elide:{ev}"):
            fwd_run(f"fwd/elide:{ev}", "substep", 0, elide_variant=ev)
            grad_run(f"grad/elide:{ev}", 0, elide_variant=ev)
    for mm in os.environ.get("FL_BATCH_MASKS", "").split(","):
        # FL_MASKS bisection: builders take use_mxu as an explicit
        # lru_cache-keyed argument read from masks.MASKS_MODE at call
        # time, so swapping the module attr + fresh trace picks it up.
        if mm and want(f"masks:{mm}"):
            from fluidlab_tpu.ops import masks as _masks
            prev = _masks.MASKS_MODE
            _masks.MASKS_MODE = mm
            fwd_run(f"fwd/masks:{mm}", "substep", 0)
            grad_run(f"grad/masks:{mm}", 0)
            _masks.MASKS_MODE = prev
    for combo in os.environ.get("FL_BATCH_PREC", "").split(","):
        # bf16x2 strategy sweep: '+'-joined tokens acc3x|acc1x|mask3x|
        # mask1p (mask1p = FL_MASK_DOT_PREC=default, 1 bf16 pass).
        # The accessors are lru_cached — clear them around each point.
        if combo and want(f"prec:{combo}"):
            from fluidlab_tpu.ops import masks as _masks
            envs = {}
            for tok in combo.split("+"):
                if tok == "acc3x":
                    envs["FL_ACC_DOT"] = "3x"
                elif tok == "acc1x":
                    envs["FL_ACC_DOT"] = "1x"
                elif tok == "mask3x":
                    envs["FL_MASK_DOT_PREC"] = "3x"
                elif tok == "mask1p":
                    envs["FL_MASK_DOT_PREC"] = "default"
                else:
                    raise ValueError(f"unknown prec token {tok!r}")
            os.environ.update(envs)
            _masks.acc_dot_mode.cache_clear()
            _masks.mask_dot_prec.cache_clear()
            _masks.dot_prec.cache_clear()
            _masks.grad_dot_mode.cache_clear()  # follows FL_ACC_DOT
            fwd_run(f"fwd/prec:{combo}", "substep", 0)
            grad_run(f"grad/prec:{combo}", 0, all_inviscid_liquid=False)
            for k in envs:
                del os.environ[k]
            _masks.acc_dot_mode.cache_clear()
            _masks.mask_dot_prec.cache_clear()
            _masks.dot_prec.cache_clear()
            _masks.grad_dot_mode.cache_clear()
    if want("smoke"):
        smoke_run("smoke")
    for it in os.environ.get("FL_BATCH_SMOKEITERS", "").split(","):
        # reference default is 500 Jacobi iters (smoke_field.py:20) —
        # the 50-iter headline needs a companion number at 500
        if it and want(f"smoke/iters:{it}"):
            smoke_run(f"smoke/iters:{it}", iters=int(it))
    for rs in os.environ.get("FL_BATCH_SMOKERES", "").split(","):
        # 128^3 x 5 unrolled steps OOMs the 16G chip at compile (queue
        # r5); smaller res isolates the trilerp variants while the
        # memory plan is investigated.
        if rs and want(f"smoke/res:{rs}"):
            smoke_run(f"smoke/res:{rs}", res=int(rs))
    for tl in os.environ.get("FL_BATCH_TRILERP", "").split(","):
        # FL_TRILERP is read at trace time (no cache) — set + retrace.
        if tl and want(f"smoke/tl:{tl}"):
            os.environ["FL_TRILERP"] = tl
            smoke_run(f"smoke/tl:{tl}", inner=5)
            del os.environ["FL_TRILERP"]
    for gd in os.environ.get("FL_BATCH_GRADDOT", "").split(","):
        # FL_GRAD_DOT sweep: backward-kernel dot strategy (lru-cached,
        # read lazily at kernel trace time — clear + fresh jit retraces)
        if gd and want(f"grad/graddot:{gd}"):
            from fluidlab_tpu.ops.masks import grad_dot_mode
            os.environ["FL_GRAD_DOT"] = gd
            grad_dot_mode.cache_clear()
            grad_run(f"grad/graddot:{gd}", 0)
            del os.environ["FL_GRAD_DOT"]
            grad_dot_mode.cache_clear()
    for im in os.environ.get("FL_BATCH_SMOKEIMPL", "").split(","):
        # FL_SMOKE_IMPL sweep: pallas (fused advection + VMEM Jacobi
        # kernels) vs xla (stencil fusions + scanned Jacobi).
        if im and want(f"smoke/impl:{im}"):
            smoke_run(f"smoke/impl:{im}", impl=im,
                      inner=20 if im.startswith("pallas") else 5)
    for im in os.environ.get("FL_BATCH_SMOKEGRAD", "").split(","):
        if im and want(f"smokegrad/impl:{im}"):
            smoke_run(f"smokegrad/impl:{im}", impl=im, grad=True)
    print("BATCH DONE", flush=True)


if __name__ == "__main__":
    main()
