"""MXU-built one-hot stencil masks for the block-binned Pallas kernels.

Profiling (RESULTS.md round-2b/3) shows the transfer kernels are not
MXU-bound: at 65k the forward pair spends ~1.9 of 3.0 ms building the
per-chunk one-hot weight masks on the VPU — for every chunk, per axis,
three (CHUNK, r2pad)-wide compare+select+mul passes plus the iota /
div / mod index lattices they compare against.

This module moves that work to the MXU and to *constant* operands:

    Wax[p, col] = w[p, off] at off = a_col[col] - lb[p]  (0..2, else 0)
                = sum_{j, o} (w[p, o] * [lb[p] == j]) * [a_col[col] == j + o]
                = (EW @ M)[p, col]

with EW (CHUNK, 128) built from ONE 128-lane float compare per axis
(columns encode (o, j) as o*SEG + (j + OFF0)) and M a **compile-time
constant** (128, r2pad) selection matrix passed to the kernel as an
input block with a constant index map (the pipeline skips re-copies of
a revisited block, so it is DMA'd once).  The index lattices
(a_col, b_col, col_valid, zcol, z_valid) become constant rows of the
same operand instead of per-chunk iota+div+mod builds.

The OFF0 shift keeps the original partial-stencil semantics for
particles whose (persistent-binning) drifted lb falls 1-2 cells outside
the region: matching encodes lb in [-OFF0, SEG-OFF0), exactly the lb
range for which any stencil cell still lands inside the region.

Gated by FL_MASKS=mxu|vpu in the kernels (ops/g2p_pallas.py,
ops/regions_pallas.py, ops/transfer_bwd_pallas.py).
"""

from __future__ import annotations

import functools
import os as _os

import numpy as np

SEG = 32    # column stride per offset o in the EW encoding (3*SEG <= 128)
OFF0 = 2    # encoded lb value = j - OFF0 (covers edge partial stencils)

MASKS_MODE = _os.environ.get("FL_MASKS", "mxu")


def use_mxu() -> bool:
    """Current masks mode, read at CALL time (not baked at import).

    Kernel builders take this as an explicit argument so their
    lru_cache keys include the mode — swapping ``masks.MASKS_MODE``
    mid-process (tools/tpu_bench_batch.py FL_BATCH_MASKS sweep) then
    builds fresh kernels instead of silently reusing stale ones.
    """
    return MASKS_MODE == "mxu"


@functools.lru_cache(maxsize=None)
def dot_prec():
    """MXU pass count for the kernels' f32 dots (FL_DOT_PREC).

    f32 matmuls on the MXU are emulated with bf16 passes; XLA's
    precision knob trades passes for mantissa bits: 'default' (1 pass,
    ~8 mantissa bits), 'high' (3 passes, ~16), 'highest' (6 passes,
    full f32).  Unset -> None (backend default, current behavior).
    The one-hot mask contractions select/sum <=3 terms of O(1) weights,
    so lower precision costs ~1e-5 relative there; the accumulate
    contractions sum 128 particle contributions and are more sensitive.
    """
    import jax

    name = _os.environ.get("FL_DOT_PREC")
    if not name:
        return None
    if name == "high":
        raise ValueError(
            "FL_DOT_PREC=high: Mosaic only lowers DEFAULT/HIGHEST for "
            "in-kernel dots (RESULTS.md r5) — use FL_ACC_DOT=3x for the "
            "3-pass middle ground, or FL_DOT_PREC=default|highest."
        )
    return {
        "default": jax.lax.Precision.DEFAULT,
        "highest": jax.lax.Precision.HIGHEST,
    }[name]


@functools.lru_cache(maxsize=None)
def _consts_np(m: int):
    """Constant mask operand rows for region geometry ``m``:

    rows 0:128    Mx[o*SEG + j, col] = [a_col[col] == (j - OFF0) + o] * valid
    rows 128:256  My (same for b_col)
    row 256       a_col (float, clamped as in the kernels)
    row 257       b_col
    row 258       col_valid
    row 259       zcol (lanes 0:RCOLS)
    row 260       z_valid (lanes 0:RCOLS)
    rows 261:264  zero padding (8-row alignment)
    """
    from fluidlab_tpu.ops.p2g_pallas import _r2pad, _region

    region = _region(m)
    r2 = region * region
    r2pad = _r2pad(m)
    out = np.zeros((264, r2pad), np.float32)
    col = np.arange(r2pad)
    a_col = np.minimum(col // region, region - 1)
    b_col = col % region
    valid = col < r2
    for o in range(3):
        for j in range(SEG):
            lb = j - OFF0
            out[o * SEG + j] = ((a_col == lb + o) & valid)
            out[128 + o * SEG + j] = ((b_col == lb + o) & valid)
    out[256] = a_col
    out[257] = b_col
    out[258] = valid
    ncz = min(128, r2pad)
    z = np.arange(ncz)
    out[259, :ncz] = z
    out[260, :ncz] = z < region
    return out


@functools.lru_cache(maxsize=None)
def _consts_wcols_np(m: int):
    """(128 + CPAD, wcols) consts for the accumulate kernel:
    rows 0:128      Mzw[o*SEG + j, wcol] = [wcol//CPAD == (j - OFF0) + o]
    rows 128:128+CPAD  p_tile[f, wcol] = [wcol % CPAD == f]
    (row count padded to a multiple of 8)."""
    from fluidlab_tpu.ops.p2g_pallas import CPAD, _region

    region = _region(m)
    wcols = region * CPAD
    rows = 128 + ((CPAD + 7) // 8) * 8
    out = np.zeros((rows, wcols), np.float32)
    c_wcol = np.arange(wcols) // CPAD
    for o in range(3):
        for j in range(SEG):
            out[o * SEG + j] = c_wcol == (j - OFF0) + o
    f_wcol = np.arange(wcols) % CPAD
    for f in range(CPAD):
        out[128 + f] = f_wcol == f
    return out


def make_ew(jcol, w3, lbf):
    """EW[p, o*SEG + j] = w3[p, o] * [lbf[p] == j - OFF0].

    ``jcol`` int32 (CHUNK, 128) lane iota; ``w3`` (CHUNK, 3) per-axis
    weights; ``lbf`` (CHUNK, 1) float lower-bound cell.  ~5 VPU ops on
    128 lanes, replacing 3 compare+select passes on r2pad lanes.
    """
    import jax.numpy as jnp

    seg = jcol >> 5
    jjf = (jcol & (SEG - 1)).astype(jnp.float32) - float(OFF0)
    wsel = jnp.where(
        seg == 0, w3[:, 0:1], jnp.where(seg == 1, w3[:, 1:2], w3[:, 2:3])
    )
    return jnp.where((jjf == lbf) & (seg < 3), wsel, 0.0)


@functools.lru_cache(maxsize=None)
def mask_dot_prec():
    """Precision for the mask contractions alone (FL_MASK_DOT_PREC),
    falling back to FL_DOT_PREC.  The EW @ M products select/sum <= 3
    O(1) B-spline weights against a 0/1 constant matrix, so their only
    1-pass error is the bf16 rounding of the weights themselves —
    bounded and independent of the 128-deep particle accumulation that
    makes the *accumulate* dots precision-sensitive.  Mosaic supports
    only DEFAULT (1 bf16 pass) and HIGHEST (6 passes); r6 measured the
    6-pass default at 2.11x the whole forward substep, so this knob
    exists to claim the MXU-pass win where it is numerically safe.

    Returns the string ``"3x"`` for the manual bf16x2 mode (mm_ew
    branches on it — Mosaic can't express it as a lax precision), else
    a ``jax.lax.Precision`` or None (backend default).

    DEFAULT (env unset, no FL_DOT_PREC): '3x' on TPU — r2 hardware
    parity PASSES at bf16x2 (v maxdiff 2e-5 vs 1e-4 tol; 1-pass fails
    at 3e-4) and the forward runs 1.49x faster; on CPU the split would
    only triple the dot cost (CPU f32 dots are exact), so full f32.
    """
    import jax

    name = _os.environ.get("FL_MASK_DOT_PREC")
    if not name:
        if _os.environ.get("FL_DOT_PREC"):
            return dot_prec()
        return "3x" if jax.default_backend() == "tpu" else None
    if name == "3x":
        return "3x"
    if name == "high":
        raise ValueError(
            "FL_MASK_DOT_PREC=high: Mosaic only lowers DEFAULT/HIGHEST "
            "for in-kernel dots — use '3x' (two 1-pass dots, exact M) "
            "or default|highest."
        )
    return {
        "default": jax.lax.Precision.DEFAULT,
        "highest": jax.lax.Precision.HIGHEST,
    }[name]


@functools.lru_cache(maxsize=None)
def acc_dot_mode():
    """FL_ACC_DOT: precision strategy for the *accumulate* contractions
    (the 128-deep particle sums — the numerically sensitive dots).

    ''   (default) -> lax precision from FL_DOT_PREC (unset = full f32,
                      6 MXU passes on Mosaic);
    '3x' -> manual bf16x2: operands split hi+lo bf16, three 1-pass dots
            (hi*hi + hi*lo + lo*hi) — the classic bf16_3x emulation of
            Precision.HIGH, which Mosaic rejects as a lax precision but
            happily runs as explicit bf16 matmuls (~half the pass count
            of full f32 at ~2^-21 relative error);
    '1x' -> single bf16 pass (fast-math; r6 measured ~3e-4 relative
            velocity error at 65k — fine for optimization, not parity).

    DEFAULT (env unset, no FL_DOT_PREC): '3x' on TPU (r2: hardware
    transfer parity PASSES, fwd 276 vs 186 substeps/s, fwd+bwd 14.96
    vs 21.02 ms/substep); '' (exact single f32 dot) on CPU.
    """
    import jax

    mode = _os.environ.get("FL_ACC_DOT")
    if mode is None:
        if _os.environ.get("FL_DOT_PREC"):
            return ""
        return "3x" if jax.default_backend() == "tpu" else ""
    return mode


@functools.lru_cache(maxsize=None)
def grad_dot_mode():
    """FL_GRAD_DOT: precision strategy for BACKWARD-kernel accumulate
    dots (the merged moment-backward and d_vregions contractions — 5.7
    of 13.0 ms/substep fwd+bwd at '3x', RESULTS.md r2 trace).  Gradients
    feed Adam, which tolerates far more relative noise than the primal
    state integrated over 3300 substeps.

    DEFAULT (env unset): '1x' (single bf16 pass) on TPU — measured
    fwd+bwd 10.28 vs 12.98 ms/substep @65k, with the LatteArt solve
    loss course within 0.1% of the f32 course over 6 iterations and
    12.92 vs 15.55 s/iter (RESULTS.md r2); elsewhere same as
    FL_ACC_DOT.  Set FL_GRAD_DOT=3x to restore bf16x2 gradients."""
    import jax

    mode = _os.environ.get("FL_GRAD_DOT")
    if mode is None:
        if _os.environ.get("FL_ACC_DOT") or _os.environ.get("FL_DOT_PREC"):
            return acc_dot_mode()
        return "1x" if jax.default_backend() == "tpu" else acc_dot_mode()
    return mode


def acc_dot(lhs, rhs, dimension_numbers, mode=None):
    """Accumulate-class dot_general with the FL_ACC_DOT strategy (or an
    explicit ``mode`` override — backward kernels pass grad_dot_mode())."""
    import jax
    import jax.numpy as jnp

    if mode is None:
        mode = acc_dot_mode()
    if mode == "3x":
        # Mosaic rejects bf16 operands with an f32 accumulator ("Bad
        # lhs type"), so the bf16x2 split stays in f32: operands are
        # bf16-ROUNDED f32 values and each 1-pass (DEFAULT) dot's
        # internal bf16 rounding is then exact.
        lh = lhs.astype(jnp.bfloat16).astype(jnp.float32)
        ll = lhs - lh
        rh = rhs.astype(jnp.bfloat16).astype(jnp.float32)
        rl = rhs - rh

        def d(a, b):
            return jax.lax.dot_general(
                a, b, dimension_numbers,
                preferred_element_type=jnp.float32,
                precision=jax.lax.Precision.DEFAULT,
            )

        return d(lh, rh) + d(lh, rl) + d(ll, rh)
    prec = jax.lax.Precision.DEFAULT if mode == "1x" else dot_prec()
    return jax.lax.dot_general(
        lhs, rhs, dimension_numbers,
        preferred_element_type=jnp.float32, precision=prec,
    )


def mm_ew(ew, M):
    """(CHUNK, 128) @ (128, cols) on the MXU.

    FL_MASK_DOT_PREC='3x': manual bf16x2 — and because ``M`` is a 0/1
    (or small-integer-and-valid-flag) constant that is EXACT in bf16,
    the lo(M) term vanishes, so full f32-grade precision costs only TWO
    1-pass dots here (vs 6 for lax full-f32).
    """
    import jax
    import jax.numpy as jnp

    prec = mask_dot_prec()
    if prec == "3x":
        # same f32-operand bf16x2 form as acc_dot (Mosaic rejects bf16
        # operands); M is 0/1-exact in bf16, so lo(M) vanishes and two
        # 1-pass dots give full f32-grade precision.
        dn = (((1,), (0,)), ((), ()))

        def d(a, b):
            return jax.lax.dot_general(
                a, b, dn, preferred_element_type=jnp.float32,
                precision=jax.lax.Precision.DEFAULT,
            )

        eh = ew.astype(jnp.bfloat16).astype(jnp.float32)
        el = ew - eh
        return d(eh, M) + d(el, M)
    return jax.lax.dot_general(
        ew, M, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32, precision=prec,
    )
