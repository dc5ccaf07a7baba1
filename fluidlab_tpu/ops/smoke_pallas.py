"""Pallas TPU kernels for the Eulerian smoke step.

Two kernels replace the XLA hot spots of ``engine/smoke.py`` (reference
fluidlab/fluidengine/simulators/smoke_field.py:95-160):

1. ``advect_rk3`` — the RK3 semi-Lagrangian backtrace plus the final
   [v | q] sample, fused into ONE kernel.  The XLA stencil form
   (smoke.py ``_trilerp_stencil``) already avoids gathers but XLA splits
   the 125-term sums into ~23 ms of loop fusions that re-read the field
   from HBM per term; here the field slab lives in VMEM and every term
   is a ``pltpu.roll`` + FMA.  Out-of-range stencil reads need no edge
   masking: the sample position is clamped into [0, R-1] cell space, so
   the tent weight of any out-of-range offset is identically zero and
   wrapped (cyclic) roll values are multiplied by 0.

2. ``jacobi_project`` — ``iters`` Jacobi pressure iterations with the
   pressure field resident in VMEM (the XLA scan re-reads p + the six
   redirect masks from HBM every iteration).  The iteration map
   ``p <- free * (sum_e redirect_e(p) - div) / 6`` is an affine map
   ``A p + B div`` whose linear part is exactly symmetric (the
   off-diagonal entry between free cells c and c+e is 1/6 from both
   sides; edge-clamped neighbors contribute to the diagonal), so the
   custom VJP runs the SAME kernel on the cotangent with div = 0:
   ``d_p0 = A^iters g`` and ``d_div = -(free/6) * sum_{k<iters} A^k g``.

Both kernels carry custom VJPs; gradient parity against the XLA path is
tested in tests/test_smoke_pallas.py (interpret mode on CPU).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _roll(x, shift: int, axis: int):
    """pltpu.roll with negative shifts normalized (roll is cyclic)."""
    size = x.shape[axis]
    shift = shift % size
    if shift == 0:
        return x
    return pltpu.roll(x, shift, axis)


# ----------------------------------------------------------------- advection

def _advect_ref(vq, dt: float, D: int):
    """Pure-XLA spec of the kernel (smoke.py stencil composition):
    RK3 backtrace from cell centers with stage-1 trilerp elided, then one
    fused [v | q] stencil sample.  Used as the custom-VJP backward (the
    kernel and this function compute the same math)."""
    from fluidlab_tpu.engine import smoke as _smoke

    R = vq.shape[1]
    ar = jnp.arange(R, dtype=jnp.float32)
    pos = jnp.stack(jnp.meshgrid(ar, ar, ar, indexing="ij")) + 0.5
    v = vq[:3]

    def tl(f, p):
        return _smoke._trilerp_stencil(f, p, D=D)

    back = _smoke._backtrace_rk3(v, pos, dt, v_at_p=v, tl=tl)
    return tl(vq, back)


@functools.lru_cache(maxsize=None)
def _make_advect_kernel(C: int, R: int, S: int, D: int, dt: float):
    """One x-slab program: inputs are the (C, S, R, R) x-neighbor blocks
    i-1, i, i+1 of the channel-major field; output is the advected slab.
    The 3-block window covers slab +- D source rows, so S >= D."""
    assert S >= D, f"advect slab S={S} must cover the stencil D={D}"
    nblk = R // S
    offs = tuple(range(-D, D + 1))

    def kernel(xm_ref, x0_ref, xp_ref, out_ref):
        i = pl.program_id(0)
        # Mosaic iota must be integer-typed; cast to f32 after.
        xg = jax.lax.broadcasted_iota(jnp.int32, (S, R, R), 0).astype(
            jnp.float32
        ) + (i * S).astype(jnp.float32)
        yg = jax.lax.broadcasted_iota(jnp.int32, (S, R, R), 1).astype(
            jnp.float32
        )
        zg = jax.lax.broadcasted_iota(jnp.int32, (S, R, R), 2).astype(
            jnp.float32
        )
        gax = (xg, yg, zg)
        xcat = jnp.concatenate([xm_ref[:], x0_ref[:], xp_ref[:]], axis=1)

        def sample(p3, nch):
            # destination row r reads global x = i*S + r + ox
            # -> xcat row S + r + ox
            w3 = _tent_weights(p3, gax, offs, R, D, False)
            return _sample_rows(xcat, S, w3, offs, nch, S)

        cx, cy, cz = xg + 0.5, yg + 0.5, zg + 0.5
        v1x, v1y, v1z = x0_ref[0], x0_ref[1], x0_ref[2]
        # stage 1 sample elided: positions are the cell centers
        v2 = sample(
            (cx - 0.5 * dt * v1x, cy - 0.5 * dt * v1y, cz - 0.5 * dt * v1z),
            3,
        )
        v3 = sample(
            (cx - 0.75 * dt * v2[0], cy - 0.75 * dt * v2[1],
             cz - 0.75 * dt * v2[2]),
            3,
        )
        c23, c13, c49 = 2.0 / 9.0, 1.0 / 3.0, 4.0 / 9.0
        bx = cx - dt * (c23 * v1x + c13 * v2[0] + c49 * v3[0])
        by = cy - dt * (c23 * v1y + c13 * v2[1] + c49 * v3[1])
        bz = cz - dt * (c23 * v1z + c13 * v2[2] + c49 * v3[2])
        out_ref[:] = sample((bx, by, bz), C)

    def mk_index(e):
        def index(i):
            return (0, jnp.clip(i + e, 0, nblk - 1), 0, 0)

        return index

    def run(vq):
        return pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct((C, R, R, R), jnp.float32),
            grid=(nblk,),
            in_specs=[
                pl.BlockSpec((C, S, R, R), mk_index(e)) for e in (-1, 0, 1)
            ],
            out_specs=pl.BlockSpec((C, S, R, R), lambda i: (0, i, 0, 0)),
            # the unrolled 125-term stencil keeps ~70M (S=4, R=128) of
            # live temporaries on the Mosaic stack — the default 16M
            # scoped-vmem limit is far too small
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=110 * 1024 * 1024
            ),
        )(vq, vq, vq)

    return run


@functools.partial(jax.custom_vjp, nondiff_argnums=(1, 2, 3, 4))
def advect_rk3(vq, dt: float, D: int = 2, S: int = 8,
               interpret: bool = False):
    """RK3 semi-Lagrangian advection of the channel-major field ``vq``
    ((3 + Q, R, R, R); channels 0:3 are the velocity) by ``dt`` with the
    clamped-stencil trilerp contract (displacements beyond D cells
    saturate).  Fused Pallas kernel forward; XLA-stencil VJP backward."""
    return _advect_impl(vq, dt, D, S, interpret)


def _advect_impl(vq, dt, D, S, interpret):
    C, R = vq.shape[0], vq.shape[1]
    run = _make_advect_kernel(C, R, S, D, dt)
    if interpret:
        with pltpu.force_tpu_interpret_mode():
            return run(vq)
    return run(vq)


def _advect_fwd(vq, dt, D, S, interpret):
    return _advect_impl(vq, dt, D, S, interpret), vq


def _bwd_ctx(C, R, S, D):
    """Shared geometry for the split backward kernels: window half-width
    w (enough neighbor blocks to cover slab +- 2D rows), extended-slab
    size E, and the in-window row base of the center block."""
    w = -(-2 * D // S)  # ceil(2D / S)
    return w, S + 2 * D, w * S


def _win_specs(C, R, S, w):
    nblk = R // S

    def mk(e):
        def index(i):
            return (0, jnp.clip(i + e, 0, nblk - 1), 0, 0)

        return index

    return [pl.BlockSpec((C, S, R, R), mk(e)) for e in range(-w, w + 1)]


def _ext_iotas(i, R, S, E, D):
    xg = jax.lax.broadcasted_iota(jnp.int32, (E, R, R), 0).astype(
        jnp.float32
    ) + (i * S - D).astype(jnp.float32)
    yg = jax.lax.broadcasted_iota(jnp.int32, (E, R, R), 1).astype(jnp.float32)
    zg = jax.lax.broadcasted_iota(jnp.int32, (E, R, R), 2).astype(jnp.float32)
    return xg, yg, zg


def _tent_weights(p3, gax, offs, R, D, with_grad):
    """Per-axis tent weights (and optionally derivative factors) of the
    clamped-stencil trilerp at the given positions."""
    w, dw = [], []
    for p_ax, g_ax in zip(p3, gax):
        x = p_ax - 0.5
        pI = jnp.clip(x, 0.0, float(R - 1))
        raw = pI - g_ax
        rel = jnp.clip(raw, float(-D), float(D))
        if with_grad:
            mask = (
                (x > 0.0) & (x < float(R - 1))
                & (raw > float(-D)) & (raw < float(D))
            ).astype(jnp.float32)
        wa, dwa = [], []
        for o in offs:
            t = rel - o
            wa.append(jnp.maximum(0.0, 1.0 - jnp.abs(t)))
            if with_grad:
                dwa.append(
                    jnp.where(jnp.abs(t) < 1.0, -jnp.sign(t), 0.0) * mask
                )
        w.append(wa)
        dw.append(dwa)
    return (w, dw) if with_grad else w


def _sample_rows(xcat, row0, w3, offs, nch, E):
    """Forward stencil sample over E rows; xcat rows [row0+ox, +E)."""
    acc = jnp.zeros((nch, E,) + xcat.shape[2:], jnp.float32)
    for oxi, ox in enumerate(offs):
        sl = xcat[:nch, row0 + ox:row0 + ox + E]
        for oyi, oy in enumerate(offs):
            sly = _roll(sl, -oy, 2)
            wxy = w3[0][oxi] * w3[1][oyi]
            for ozi, oz in enumerate(offs):
                slz = _roll(sly, -oz, 3)
                acc = acc + (wxy * w3[2][ozi])[None] * slz
    return acc


_A1, _A2, _A3 = 2.0 / 9.0, 1.0 / 3.0, 4.0 / 9.0


@functools.lru_cache(maxsize=None)
def _make_bwd_stages_kernel(C: int, R: int, S: int, D: int, dt: float):
    """K0: recompute the RK3 stage fields v2, v3 at core rows."""
    w, E, W0 = _bwd_ctx(C, R, S, D)
    offs = tuple(range(-D, D + 1))
    nblk = R // S

    def kernel(*refs):
        out_ref = refs[-1]
        i = pl.program_id(0)
        xcat = jnp.concatenate([r[:] for r in refs[:-1]], axis=1)
        xg, yg, zg = _ext_iotas(i, R, S, E, D)
        gax = (xg, yg, zg)
        cx, cy, cz = xg + 0.5, yg + 0.5, zg + 0.5
        v1 = xcat[0:3, W0 - D:W0 - D + E]
        p1 = (cx - 0.5 * dt * v1[0], cy - 0.5 * dt * v1[1],
              cz - 0.5 * dt * v1[2])
        w1 = _tent_weights(p1, gax, offs, R, D, False)
        v2 = _sample_rows(xcat, W0 - D, w1, offs, 3, E)
        p2 = (cx - 0.75 * dt * v2[0], cy - 0.75 * dt * v2[1],
              cz - 0.75 * dt * v2[2])
        w2 = _tent_weights(p2, gax, offs, R, D, False)
        v3 = _sample_rows(xcat, W0 - D, w2, offs, 3, E)
        out_ref[0:3] = v2[:, D:D + S]
        out_ref[3:6] = v3[:, D:D + S]

    def run(vq):
        return pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct((6, R, R, R), jnp.float32),
            grid=(nblk,),
            in_specs=_win_specs(C, R, S, w),
            out_specs=pl.BlockSpec((6, S, R, R), lambda i: (0, i, 0, 0)),
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=110 * 1024 * 1024
            ),
        )(*([vq] * (2 * w + 1)))

    return run


@functools.lru_cache(maxsize=None)
def _make_bwd_pass_kernel(C: int, R: int, S: int, D: int, dt: float,
                          which: str):
    """One adjoint pass of the RK3 advection:

    - 'A': weights from b; scot = g (C ch); src = vq.
      outputs acc (C, S, .) and d_b (3, S, .)
    - 'B': weights from p2; scot = -dt*a3*db (3 ch); src = v.
      outputs acc (3) and d_p2 (3)
    - 'C': weights from p1; scot = d_v2 = -dt*a2*db - 0.75dt*dp2;
      src = v.  outputs acc (3) and d_v1 (3) (finalized: includes the
      center -dt*a1*db - 0.5dt*dp1 term)

    Each transpose sums contributions from forward-destination rows
    i = j - ox; at global x edges those rows are phantom (the clamped
    neighbor blocks hold duplicate data with NON-vanishing recomputed
    weights) and must be masked; y/z roll wrap is safe (real rows whose
    weight for that offset vanishes).
    """
    w, E, W0 = _bwd_ctx(C, R, S, D)
    offs = tuple(range(-D, D + 1))
    nblk = R // S
    nwin = 2 * w + 1
    nch = C if which == "A" else 3

    def kernel(*refs):
        out_acc, out_dp = refs[-2], refs[-1]
        i = pl.program_id(0)
        vq_refs = refs[:nwin]
        xcat = jnp.concatenate([r[:] for r in vq_refs], axis=1)
        xg, yg, zg = _ext_iotas(i, R, S, E, D)
        gax = (xg, yg, zg)
        cx, cy, cz = xg + 0.5, yg + 0.5, zg + 0.5
        v1 = xcat[0:3, W0 - D:W0 - D + E]

        if which == "A":
            gcat = jnp.concatenate(
                [r[:] for r in refs[nwin:2 * nwin]], axis=1
            )
            stcat = jnp.concatenate(
                [r[:] for r in refs[2 * nwin:3 * nwin]], axis=1
            )
            st = stcat[:, W0 - D:W0 - D + E]
            v2, v3 = st[0:3], st[3:6]
            pos = (
                cx - dt * (_A1 * v1[0] + _A2 * v2[0] + _A3 * v3[0]),
                cy - dt * (_A1 * v1[1] + _A2 * v2[1] + _A3 * v3[1]),
                cz - dt * (_A1 * v1[2] + _A2 * v2[2] + _A3 * v3[2]),
            )
            scot = gcat[:, W0 - D:W0 - D + E]
        elif which == "B":
            stcat = jnp.concatenate(
                [r[:] for r in refs[nwin:2 * nwin]], axis=1
            )
            dbcat = jnp.concatenate(
                [r[:] for r in refs[2 * nwin:3 * nwin]], axis=1
            )
            v2 = stcat[0:3, W0 - D:W0 - D + E]
            pos = (cx - 0.75 * dt * v2[0], cy - 0.75 * dt * v2[1],
                   cz - 0.75 * dt * v2[2])
            scot = (-dt * _A3) * dbcat[:, W0 - D:W0 - D + E]
        else:
            dbcat = jnp.concatenate(
                [r[:] for r in refs[nwin:2 * nwin]], axis=1
            )
            dp2cat = jnp.concatenate(
                [r[:] for r in refs[2 * nwin:3 * nwin]], axis=1
            )
            pos = (cx - 0.5 * dt * v1[0], cy - 0.5 * dt * v1[1],
                   cz - 0.5 * dt * v1[2])
            db_e = dbcat[:, W0 - D:W0 - D + E]
            scot = (
                (-dt * _A2) * db_e
                - (0.75 * dt) * dp2cat[:, W0 - D:W0 - D + E]
            )

        wt, dwt = _tent_weights(pos, gax, offs, R, D, True)
        jrow = jax.lax.broadcasted_iota(jnp.int32, (S, 1, 1), 0) + i * S

        acc = jnp.zeros((nch, S, R, R), jnp.float32)
        dpx = jnp.zeros((E, R, R), jnp.float32)
        dpy = jnp.zeros((E, R, R), jnp.float32)
        dpz = jnp.zeros((E, R, R), jnp.float32)
        for oxi, ox in enumerate(offs):
            src = xcat[:nch, W0 - D + ox:W0 - D + ox + E]
            gi = jrow - ox
            mx = ((gi >= 0) & (gi <= R - 1)).astype(jnp.float32)[None]
            for oyi, oy in enumerate(offs):
                srcy = _roll(src, -oy, 2)
                wxy = wt[0][oxi] * wt[1][oyi]
                dwx_wy = dwt[0][oxi] * wt[1][oyi]
                wx_dwy = wt[0][oxi] * dwt[1][oyi]
                for ozi, oz in enumerate(offs):
                    srcz = _roll(srcy, -oz, 3)
                    w3 = wxy * wt[2][ozi]
                    t = (w3[None] * scot)[:, D - ox:D - ox + S]
                    t = _roll(t, oy, 2)
                    t = _roll(t, oz, 3)
                    acc = acc + mx * t
                    sdot = jnp.sum(scot * srcz, axis=0)
                    dpx = dpx + sdot * (dwx_wy * wt[2][ozi])
                    dpy = dpy + sdot * (wx_dwy * wt[2][ozi])
                    dpz = dpz + sdot * (wxy * dwt[2][ozi])
        dp = jnp.stack([dpx, dpy, dpz])[:, D:D + S]
        out_acc[...] = acc
        if which == "C":
            # finalize d_v1 = -dt a1 db - 0.5 dt dp1 at core rows
            out_dp[...] = (
                (-dt * _A1) * dbcat[:, W0:W0 + S] - (0.5 * dt) * dp
            )
        else:
            out_dp[...] = dp

    def run(vq, *extras):
        # extras: A -> (g, stages); B -> (stages, db); C -> (db, dp2)
        args = [vq] * nwin
        for e in extras:
            args += [e] * nwin
        in_specs = _win_specs(C, R, S, w)
        for e in extras:
            in_specs += _win_specs(e.shape[0], R, S, w)
        return pl.pallas_call(
            kernel,
            out_shape=(
                jax.ShapeDtypeStruct((nch, R, R, R), jnp.float32),
                jax.ShapeDtypeStruct((3, R, R, R), jnp.float32),
            ),
            grid=(nblk,),
            in_specs=in_specs,
            out_specs=(
                pl.BlockSpec((nch, S, R, R), lambda i: (0, i, 0, 0)),
                pl.BlockSpec((3, S, R, R), lambda i: (0, i, 0, 0)),
            ),
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=110 * 1024 * 1024
            ),
        )(*args)

    return run


def _advect_bwd_kernel_impl(vq, g, dt, D, S_bwd, interpret):
    C, R = vq.shape[0], vq.shape[1]
    stages = _make_bwd_stages_kernel(C, R, S_bwd, D, dt)
    pA = _make_bwd_pass_kernel(C, R, S_bwd, D, dt, "A")
    pB = _make_bwd_pass_kernel(C, R, S_bwd, D, dt, "B")
    pC = _make_bwd_pass_kernel(C, R, S_bwd, D, dt, "C")

    def go():
        st = stages(vq)
        accA, db = pA(vq, g, st)
        accB, dp2 = pB(vq, st, db)
        accC, dv1 = pC(vq, db, dp2)
        dv = accA[0:3] + accB + accC + dv1
        if C > 3:
            return jnp.concatenate([dv, accA[3:]], axis=0)
        return dv

    if interpret:
        with pltpu.force_tpu_interpret_mode():
            return go()
    return go()


def _advect_bwd(dt, D, S, interpret, vq, g):
    import os

    mode = os.environ.get("FL_SMOKE_BWD", "kernel")
    R = vq.shape[1]
    # backward slab: smaller than the forward's (the adjoint pass holds
    # ~3x the live temporaries); any S_bwd works via the parametric
    # window w = ceil(2D / S_bwd).
    s_env = os.environ.get("FL_SMOKE_BWD_S")
    S_bwd = int(s_env) if s_env else max(1, S // 2)
    if mode != "kernel" or R % S_bwd != 0:
        _, vjp = jax.vjp(lambda a: _advect_ref(a, dt, D), vq)
        return (vjp(g)[0],)
    return (_advect_bwd_kernel_impl(vq, g, dt, D, S_bwd, interpret),)


advect_rk3.defvjp(_advect_fwd, _advect_bwd)


# ------------------------------------------------------------------- Jacobi

@functools.lru_cache(maxsize=None)
def _make_jacobi_kernel(R: int, iters: int, with_acc: bool):
    """All ``iters`` Jacobi iterations in one program, p resident in
    VMEM.  With ``with_acc`` also emits sum_{k<iters} A^k p0 (the VJP
    needs it for d_div)."""

    def kernel(*refs):
        if with_acc:
            p_ref, div_ref, free_ref, out_ref, acc_ref = refs
        else:
            p_ref, div_ref, free_ref, out_ref = refs
        free = free_ref[:]
        div = div_ref[:]
        # wrapped-plane masks (broadcastable singleton shapes, ~1 tile)
        ixl = jax.lax.broadcasted_iota(jnp.int32, (R, 1, 1), 0)
        iyl = jax.lax.broadcasted_iota(jnp.int32, (1, R, 1), 1)
        izl = jax.lax.broadcasted_iota(jnp.int32, (1, 1, R), 2)
        ne = {
            (0, -1): (ixl != R - 1).astype(jnp.float32),
            (0, 1): (ixl != 0).astype(jnp.float32),
            (1, -1): (iyl != R - 1).astype(jnp.float32),
            (1, 1): (iyl != 0).astype(jnp.float32),
            (2, -1): (izl != R - 1).astype(jnp.float32),
            (2, 1): (izl != 0).astype(jnp.float32),
        }
        # roll shift s along axis a brings p(idx - s); the redirect for
        # direction +e_a needs p(idx + 1) -> shift -1.
        cnt_live = jnp.zeros((R, R, R), jnp.float32)
        for (a, s), m in ne.items():
            cnt_live = cnt_live + m * _roll(free, s, a)
        self_w = 6.0 - cnt_live
        sixth = jnp.float32(1.0 / 6.0)

        def apply_A(p, rhs):
            nb = jnp.zeros((R, R, R), jnp.float32)
            for (a, s), m in ne.items():
                nb = nb + m * _roll(p, s, a)
            return free * ((nb + self_w * p - rhs) * sixth)

        if with_acc:
            def body(_, carry):
                p, acc = carry
                return apply_A(p, div), acc + p

            p0 = p_ref[:]
            p_out, acc = jax.lax.fori_loop(
                0, iters, body, (p0, jnp.zeros((R, R, R), jnp.float32))
            )
            out_ref[:] = p_out
            acc_ref[:] = acc
        else:
            def body(_, p):
                return apply_A(p, div)

            out_ref[:] = jax.lax.fori_loop(0, iters, body, p_ref[:])

    def run(p0, div, free_f):
        out_shape = jax.ShapeDtypeStruct((R, R, R), jnp.float32)
        shapes = (out_shape, out_shape) if with_acc else out_shape
        return pl.pallas_call(
            kernel,
            out_shape=shapes,
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 3,
            out_specs=(
                (pl.BlockSpec(memory_space=pltpu.VMEM),) * 2
                if with_acc
                else pl.BlockSpec(memory_space=pltpu.VMEM)
            ),
            # full-field iteration state + per-iteration roll temporaries
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=110 * 1024 * 1024
            ),
        )(p0, div, free_f)

    return run


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4))
def jacobi_project(p0, div, free_f, iters: int, interpret: bool = False):
    """``iters`` Jacobi iterations of the free-cell pressure projection
    (reference pressure_jacobi kernel, smoke_field.py:135-146, with the
    compute_location neighbor redirects).  ``free_f`` is the float free
    mask and is treated as a constant (zero cotangent).  ``p0`` must
    already be masked by ``free_f``."""
    return _jacobi_impl(p0, div, free_f, iters, interpret, False)[0]


def _jacobi_impl(p0, div, free_f, iters, interpret, with_acc):
    R = p0.shape[0]
    run = _make_jacobi_kernel(R, iters, with_acc)
    if interpret:
        with pltpu.force_tpu_interpret_mode():
            out = run(p0, div, free_f)
    else:
        out = run(p0, div, free_f)
    return out if with_acc else (out,)


def _jacobi_fwd(p0, div, free_f, iters, interpret):
    return _jacobi_impl(p0, div, free_f, iters, interpret, False)[0], free_f


def _jacobi_bwd(iters, interpret, free_f, g):
    # The kernel computes A_kernel = A_true restricted to free-masked
    # inputs (the nb_free redirect factor is elided because p is always
    # masked); A_true g == A_kernel (free * g), so mask the cotangent
    # once up front.  A_true is symmetric, so the adjoint iteration IS
    # the forward iteration with div = 0.
    s, acc = _jacobi_impl(
        free_f * g, jnp.zeros_like(g), free_f, iters, interpret, True
    )
    d_p0 = s
    d_div = -(free_f / 6.0) * acc
    return d_p0, d_div, jnp.zeros_like(free_f)


jacobi_project.defvjp(_jacobi_fwd, _jacobi_bwd)
