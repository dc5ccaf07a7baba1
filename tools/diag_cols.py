"""Diagnose the cols-vs-rows merged grid-phase forward divergence.

Builds the exact inputs of tests/test_grid_phase_merged.py, computes an
f64 dense reference of the p2g->gridop->g2p pipeline in numpy, and
reports the error of (a) the split rows path, (b) the merged path at the
current FL_KORIENT, against that reference.  Run twice:

    FL_KORIENT=rows python tools/diag_cols.py
    FL_KORIENT=cols python tools/diag_cols.py
"""

import os

import jax

jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp
import numpy as np

from fluidlab_tpu.core.bspline import base_and_fx_soa
from fluidlab_tpu.core.mat3 import mv_soa
from fluidlab_tpu.ops.binning import compute_binning
from fluidlab_tpu.ops.regions_pallas import (
    _korient,
    g2p_regions,
    make_grid_phase,
    p2g_regions,
)

G = 32
N = 700
DX = 1.0 / G


def make_inputs():
    rng = np.random.default_rng(11)
    x = jnp.asarray(rng.uniform(0.08, 0.92, (3, N)).astype(np.float32))
    base, fx = base_and_fx_soa(x, float(G))
    base = jnp.clip(base, 0, G - 3)
    usedf = jnp.asarray((rng.uniform(size=N) > 0.2).astype(np.float32))
    mass = jnp.asarray(rng.uniform(0.5, 2.0, N).astype(np.float32))
    v = jnp.asarray(rng.normal(size=(3, N)).astype(np.float32))
    affine = jnp.asarray(0.1 * rng.normal(size=(9, N)).astype(np.float32))
    gmul = jnp.asarray(rng.uniform(0.5, 1.5, (1,)).astype(np.float32))
    binning = compute_binning(base, G)
    return base, fx, usedf, mass, v, affine, gmul, binning


def _gridop(greg, vop):
    (gm,) = vop
    mass_r = greg[:, 3]
    inv_mass = 1.0 / jnp.maximum(mass_r, 1e-12)
    active = (mass_r > 1e-12).astype(greg.dtype)
    return jnp.stack(
        [greg[:, d] * inv_mass * active * gm[0] for d in range(3)], axis=1
    )


def _feats13(base, fx, usedf, mass, v, affine):
    x_p = (base.astype(v.dtype) + fx) * DX
    Ax = mv_soa(affine, x_p)
    b3 = jnp.stack([mass * v[i] - Ax[i] for i in range(3)])
    return jnp.concatenate(
        [b3, affine, mass[None, :]], axis=0
    ) * usedf[None, :]


def dense_f64(inputs):
    base, fx, usedf, mass, v, affine, gm, _ = (
        np.asarray(a, np.float64) if not isinstance(a, tuple) else a
        for a in inputs
    )
    base_i = np.asarray(inputs[0])
    fx = np.asarray(inputs[1], np.float64)
    usedf = np.asarray(inputs[2], np.float64)
    mass = np.asarray(inputs[3], np.float64)
    v = np.asarray(inputs[4], np.float64)
    affine = np.asarray(inputs[5], np.float64).reshape(3, 3, N)
    gm = float(np.asarray(inputs[6])[0])

    w = np.stack([
        0.5 * (1.5 - fx) ** 2,
        0.75 - (fx - 1.0) ** 2,
        0.5 * (fx - 0.5) ** 2,
    ])  # (offset, axis, N)

    mom = np.zeros((G, G, G, 3))
    mgrid = np.zeros((G, G, G))
    x_p = (base_i.astype(np.float64) + fx) * DX
    for p in range(N):
        if usedf[p] == 0.0:
            continue
        A = affine[:, :, p]
        b = mass[p] * v[:, p] - A @ x_p[:, p]
        for i in range(3):
            for j in range(3):
                for k in range(3):
                    ww = w[i, 0, p] * w[j, 1, p] * w[k, 2, p]
                    cell = base_i[:, p] + np.array([i, j, k])
                    xc = cell * DX
                    mom[tuple(cell)] += ww * (b + A @ xc)
                    mgrid[tuple(cell)] += ww * mass[p]

    act = (mgrid > 1e-12).astype(np.float64)
    vel = mom / np.maximum(mgrid, 1e-12)[..., None] * act[..., None] * gm

    S0 = np.zeros((3, N))
    S1 = np.zeros((3, 3, N))
    for p in range(N):
        for i in range(3):
            for j in range(3):
                for k in range(3):
                    ww = w[i, 0, p] * w[j, 1, p] * w[k, 2, p]
                    cell = base_i[:, p] + np.array([i, j, k])
                    vc = vel[tuple(cell)]
                    S0[:, p] += ww * vc
                    S1[:, :, p] += ww * np.outer(vc, cell.astype(np.float64))

    xg = base_i.astype(np.float64) + fx
    new_C = 4.0 * G * (S1 - S0[:, None, :] * xg[None, :, :])
    return S0, new_C.reshape(9, N)


def out_split(inputs, m):
    base, fx, usedf, mass, v, affine, gm, binning = inputs
    gridreg = p2g_regions(base, fx, usedf, mass, v, affine, G, DX,
                          binning, m=m, interpret=True)
    vreg = _gridop(gridreg, (gm,))
    return g2p_regions(base, fx, vreg, G, float(G), binning, m=m,
                       interpret=True)


def out_merged(inputs, m):
    base, fx, usedf, mass, v, affine, gm, binning = inputs
    phase = make_grid_phase(_gridop, G, m, False, True)
    feats13 = _feats13(base, fx, usedf, mass, v, affine)
    S0, S1g = phase(fx, base, feats13, (gm,), binning)
    xg = base.astype(S0.dtype) + fx
    new_C = (4.0 * float(G)) * jnp.stack([
        S1g[3 * i + d] - S0[i] * xg[d] for i in range(3) for d in range(3)
    ])
    return S0, new_C


def report(tag, got, ref):
    gv, gc = (np.asarray(a, np.float64) for a in got)
    rv, rc = ref
    for name, a, b in (("v", gv, rv), ("C", gc, rc)):
        err = np.abs(a - b)
        print(f"  {tag} {name}: max {err.max():.3e}  mean {err.mean():.3e} "
              f" p99 {np.percentile(err, 99):.3e}")


def main():
    inputs = make_inputs()
    print(f"KORIENT={_korient()}")
    ref = dense_f64(inputs)
    for m in (0, 1):
        print(f"m={m}")
        report("split ", out_split(inputs, m), ref)
        report("merged", out_merged(inputs, m), ref)


if __name__ == "__main__":
    main()
