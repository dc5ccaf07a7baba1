"""Batched 3x3 SVD for TPU, with reference-parity custom VJP.

The reference uses Taichi's McAdams-style 3x3 SVD per particle plus a
hand-written adjoint (reference fluidlab/fluidengine/simulators/
mpm_simulator.py:260-302).  ``jnp.linalg.svd`` lowers to a general loop
that is extremely slow for huge batches of 3x3 matrices on TPU, so we
implement the classic one-sided approach in *fully scalarized* jnp — every
matrix entry is its own batched array, so the whole kernel is elementwise
VPU work with zero scatters/gathers and static shapes:

  1. Jacobi eigendecomposition of B = A^T A with a fixed number of Givens
     sweeps (branch-free, quadratically convergent),
  2. singular values s_i = sqrt(lambda_i) sorted descending by a 3-element
     sorting network,
  3. U from A V s^-1, re-orthonormalized with a cross product so that U is
     always a proper rotation (det +1),
  4. signed diagonal via s_i = u_i^T A v_i, reproducing the Taichi
     convention: U, V rotations, smallest singular value carries the sign
     of det(A).

The custom VJP implements exactly the reference ``backward_svd`` formula
(mpm_simulator.py:272-302), including the +-1e-8 denominator clamp, so
gradients through the corotated stress match the reference solver.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from fluidlab_tpu.core import mat3

_TINY = 1e-30
_SWEEPS = 5  # 3x3 Jacobi converges quadratically; 5 sweeps is ample for f32.


def _rot_coeffs(app, aqq, apq):
    """Givens (c, s) zeroing a symmetric off-diagonal entry; identity when
    the entry is already (near) zero."""
    safe_apq = jnp.where(jnp.abs(apq) > _TINY, apq, 1.0)
    tau = (aqq - app) / (2.0 * safe_apq)
    t = jnp.sign(tau) / (jnp.abs(tau) + jnp.sqrt(1.0 + tau * tau))
    c = 1.0 / jnp.sqrt(1.0 + t * t)
    s = t * c
    use = jnp.abs(apq) > _TINY
    return jnp.where(use, c, 1.0), jnp.where(use, s, 0.0)


def _eigh3_scalar(b00, b11, b22, b01, b02, b12, dtype):
    """Jacobi eigendecomposition on scalarized symmetric components.

    Returns eigenvalues (w0,w1,w2) and eigenvector matrix components vij
    (V columns are eigenvectors)."""
    one = jnp.ones_like(b00)
    zero = jnp.zeros_like(b00)
    v00, v01, v02 = one, zero, zero
    v10, v11, v12 = zero, one, zero
    v20, v21, v22 = zero, zero, one

    for _ in range(_SWEEPS):
        # pair (0, 1)
        c, s = _rot_coeffs(b00, b11, b01)
        b00, b11, b01 = (
            c * c * b00 - 2 * s * c * b01 + s * s * b11,
            s * s * b00 + 2 * s * c * b01 + c * c * b11,
            s * c * (b00 - b11) + (c * c - s * s) * b01,
        )
        b02, b12 = c * b02 - s * b12, s * b02 + c * b12
        v00, v01 = c * v00 - s * v01, s * v00 + c * v01
        v10, v11 = c * v10 - s * v11, s * v10 + c * v11
        v20, v21 = c * v20 - s * v21, s * v20 + c * v21

        # pair (0, 2)
        c, s = _rot_coeffs(b00, b22, b02)
        b00, b22, b02 = (
            c * c * b00 - 2 * s * c * b02 + s * s * b22,
            s * s * b00 + 2 * s * c * b02 + c * c * b22,
            s * c * (b00 - b22) + (c * c - s * s) * b02,
        )
        b01, b12 = c * b01 - s * b12, s * b01 + c * b12
        v00, v02 = c * v00 - s * v02, s * v00 + c * v02
        v10, v12 = c * v10 - s * v12, s * v10 + c * v12
        v20, v22 = c * v20 - s * v22, s * v20 + c * v22

        # pair (1, 2)
        c, s = _rot_coeffs(b11, b22, b12)
        b11, b22, b12 = (
            c * c * b11 - 2 * s * c * b12 + s * s * b22,
            s * s * b11 + 2 * s * c * b12 + c * c * b22,
            s * c * (b11 - b22) + (c * c - s * s) * b12,
        )
        b01, b02 = c * b01 - s * b02, s * b01 + c * b02
        v01, v02 = c * v01 - s * v02, s * v01 + c * v02
        v11, v12 = c * v11 - s * v12, s * v11 + c * v12
        v21, v22 = c * v21 - s * v22, s * v21 + c * v22

    return (b00, b11, b22), (
        (v00, v01, v02),
        (v10, v11, v12),
        (v20, v21, v22),
    )


def _swap_if(cond, a, b):
    return jnp.where(cond, b, a), jnp.where(cond, a, b)


def _svd3_impl(A):
    dtype = A.dtype
    a = [[A[..., i, j] for j in range(3)] for i in range(3)]

    # B = A^T A, symmetric components
    b00 = a[0][0] * a[0][0] + a[1][0] * a[1][0] + a[2][0] * a[2][0]
    b11 = a[0][1] * a[0][1] + a[1][1] * a[1][1] + a[2][1] * a[2][1]
    b22 = a[0][2] * a[0][2] + a[1][2] * a[1][2] + a[2][2] * a[2][2]
    b01 = a[0][0] * a[0][1] + a[1][0] * a[1][1] + a[2][0] * a[2][1]
    b02 = a[0][0] * a[0][2] + a[1][0] * a[1][2] + a[2][0] * a[2][2]
    b12 = a[0][1] * a[0][2] + a[1][1] * a[1][2] + a[2][1] * a[2][2]

    (w0, w1, w2), v = _eigh3_scalar(b00, b11, b22, b01, b02, b12, dtype)

    # sort eigen-pairs descending with a 3-element sorting network,
    # swapping V columns alongside eigenvalues
    cols = [
        jnp.stack([v[0][j], v[1][j], v[2][j]], axis=-1) for j in range(3)
    ]  # V columns as (..., 3) vectors
    ws = [w0, w1, w2]
    for (i, j) in ((0, 1), (0, 2), (1, 2)):
        cond = ws[i] < ws[j]
        ws[i], ws[j] = _swap_if(cond, ws[i], ws[j])
        cols[i], cols[j] = (
            jnp.where(cond[..., None], cols[j], cols[i]),
            jnp.where(cond[..., None], cols[i], cols[j]),
        )
    w0, w1, w2 = ws
    vc0, vc1, vc2 = cols

    # make V a proper rotation: flip last column if det < 0
    detV = jnp.sum(jnp.cross(vc0, vc1) * vc2, axis=-1)
    vc2 = vc2 * jnp.sign(detV)[..., None]

    s0 = jnp.sqrt(jnp.maximum(w0, 0.0))
    s1 = jnp.sqrt(jnp.maximum(w1, 0.0))
    s2 = jnp.sqrt(jnp.maximum(w2, 0.0))

    # U columns = A v_i / s_i, robustly re-orthonormalized
    Av0 = mat3.matvec3(A, vc0)
    Av1 = mat3.matvec3(A, vc1)

    e0 = jnp.zeros_like(Av0).at[..., 0].set(1.0)
    n0 = jnp.sqrt(jnp.sum(Av0 * Av0, axis=-1, keepdims=True))
    u0 = jnp.where(n0 > 1e-12, Av0 / jnp.maximum(n0, _TINY), e0)

    u1 = Av1 - jnp.sum(u0 * Av1, axis=-1, keepdims=True) * u0
    n1 = jnp.sqrt(jnp.sum(u1 * u1, axis=-1, keepdims=True))
    alt = jnp.cross(u0, e0)
    alt2 = jnp.cross(u0, jnp.zeros_like(u0).at[..., 1].set(1.0))
    alt_n = jnp.sum(alt * alt, axis=-1, keepdims=True)
    alt = jnp.where(alt_n > 0.01, alt, alt2)
    alt = alt / jnp.sqrt(jnp.sum(alt * alt, axis=-1, keepdims=True) + _TINY)
    u1 = jnp.where(n1 > 1e-12, u1 / jnp.maximum(n1, _TINY), alt)

    u2 = jnp.cross(u0, u1)  # det(U) = +1 by construction

    U = jnp.stack([u0, u1, u2], axis=-1)
    V = jnp.stack([vc0, vc1, vc2], axis=-1)

    # signed singular values from diag(U^T A V); keep eigen-route magnitudes
    d0 = jnp.sum(u0 * Av0, axis=-1)
    d1 = jnp.sum(u1 * Av1, axis=-1)
    Av2 = mat3.matvec3(A, vc2)
    d2 = jnp.sum(u2 * Av2, axis=-1)
    sign2 = jnp.where(d2 < 0, -1.0, 1.0).astype(dtype)
    s = jnp.stack([s0, s1, sign2 * s2], axis=-1)
    del d0, d1
    return U, s, V


def _clamp_denominator(a):
    """Symmetric clamp away from zero (reference mpm_simulator.py:294-302)."""
    return jnp.where(a >= 0, jnp.maximum(a, 1e-8), jnp.minimum(a, -1e-8))


@jax.custom_vjp
def svd3(A):
    """Batched SVD of (..., 3, 3): returns (U, s, V) with U, V proper
    rotations, s (..., 3) sorted by magnitude descending, s[2] signed by
    det(A)."""
    return _svd3_impl(A)


def _svd3_fwd(A):
    U, s, V = _svd3_impl(A)
    return (U, s, V), (U, s, V)


def _svd3_bwd(res, cotangents):
    U, s, V = res
    gU, gs, gV = cotangents
    # reference backward_svd (mpm_simulator.py:272-292)
    s2 = s * s
    # F[i, j] = 1 / clamp(s_j^2 - s_i^2), zero diagonal
    diff = s2[..., None, :] - s2[..., :, None]
    F = 1.0 / _clamp_denominator(diff)
    F = F * (1.0 - jnp.eye(3, dtype=F.dtype))

    # all products via mat3 (VPU, no dot_general)
    mm, mm_tn, mm_nt = mat3.matmul3, mat3.matmul3_tn, mat3.matmul3_nt
    S = s[..., None] * jnp.eye(3, dtype=s.dtype)  # diag(s)
    gS = gs[..., None] * jnp.eye(3, dtype=s.dtype)

    S_term = mm_nt(mm(U, gS), V)
    inner_u = F * (mm_tn(U, gU) - mm_tn(gU, U))
    u_term = mm_nt(mm(U, mm(inner_u, S)), V)
    inner_v = F * (mm_tn(V, gV) - mm_tn(gV, V))
    v_term = mm(U, mm(S, mm_nt(inner_v, V)))
    return (u_term + v_term + S_term,)


svd3.defvjp(_svd3_fwd, _svd3_bwd)


def svd3_nograd(A):
    """SVD without the custom VJP (for host-side / non-differentiated use)."""
    return _svd3_impl(A)


# ------------------------------------------------------------------ SoA API
# Engine-facing layout: matrices as (9, N) row-major, vectors (3, N) — the
# particle axis is minor so TPU tiles pack fully (see core/mat3.py).

def _cross_soa(a, b):
    return (
        a[1] * b[2] - a[2] * b[1],
        a[2] * b[0] - a[0] * b[2],
        a[0] * b[1] - a[1] * b[0],
    )


def _svd3_soa_impl(A):
    """A: (9, N) -> (U (9, N), s (3, N), V (9, N))."""
    a = [[A[3 * i + j] for j in range(3)] for i in range(3)]
    dtype = A.dtype

    b00 = a[0][0] * a[0][0] + a[1][0] * a[1][0] + a[2][0] * a[2][0]
    b11 = a[0][1] * a[0][1] + a[1][1] * a[1][1] + a[2][1] * a[2][1]
    b22 = a[0][2] * a[0][2] + a[1][2] * a[1][2] + a[2][2] * a[2][2]
    b01 = a[0][0] * a[0][1] + a[1][0] * a[1][1] + a[2][0] * a[2][1]
    b02 = a[0][0] * a[0][2] + a[1][0] * a[1][2] + a[2][0] * a[2][2]
    b12 = a[0][1] * a[0][2] + a[1][1] * a[1][2] + a[2][1] * a[2][2]

    (w0, w1, w2), v = _eigh3_scalar(b00, b11, b22, b01, b02, b12, dtype)

    # eigen-pairs as column triples
    cols = [
        (v[0][j], v[1][j], v[2][j]) for j in range(3)
    ]
    ws = [w0, w1, w2]
    for (i, j) in ((0, 1), (0, 2), (1, 2)):
        cond = ws[i] < ws[j]
        ws[i], ws[j] = _swap_if(cond, ws[i], ws[j])
        ci = tuple(jnp.where(cond, cols[j][d], cols[i][d]) for d in range(3))
        cj = tuple(jnp.where(cond, cols[i][d], cols[j][d]) for d in range(3))
        cols[i], cols[j] = ci, cj
    w0, w1, w2 = ws
    vc0, vc1, vc2 = cols

    cx = _cross_soa(vc0, vc1)
    detV = cx[0] * vc2[0] + cx[1] * vc2[1] + cx[2] * vc2[2]
    sgn = jnp.sign(detV)
    vc2 = tuple(c * sgn for c in vc2)

    s0 = jnp.sqrt(jnp.maximum(w0, 0.0))
    s1 = jnp.sqrt(jnp.maximum(w1, 0.0))
    s2 = jnp.sqrt(jnp.maximum(w2, 0.0))

    def matvec(col):
        return tuple(
            a[i][0] * col[0] + a[i][1] * col[1] + a[i][2] * col[2]
            for i in range(3)
        )

    Av0 = matvec(vc0)
    Av1 = matvec(vc1)

    n0 = jnp.sqrt(Av0[0] ** 2 + Av0[1] ** 2 + Av0[2] ** 2)
    ok0 = n0 > 1e-12
    inv0 = 1.0 / jnp.maximum(n0, _TINY)
    u0 = (
        jnp.where(ok0, Av0[0] * inv0, 1.0),
        jnp.where(ok0, Av0[1] * inv0, 0.0),
        jnp.where(ok0, Av0[2] * inv0, 0.0),
    )

    dot01 = u0[0] * Av1[0] + u0[1] * Av1[1] + u0[2] * Av1[2]
    u1r = tuple(Av1[d] - dot01 * u0[d] for d in range(3))
    n1 = jnp.sqrt(u1r[0] ** 2 + u1r[1] ** 2 + u1r[2] ** 2)
    e0 = (jnp.ones_like(n0), jnp.zeros_like(n0), jnp.zeros_like(n0))
    alt = _cross_soa(u0, e0)
    altn = alt[0] ** 2 + alt[1] ** 2 + alt[2] ** 2
    e1 = (jnp.zeros_like(n0), jnp.ones_like(n0), jnp.zeros_like(n0))
    alt2 = _cross_soa(u0, e1)
    alt = tuple(jnp.where(altn > 0.01, alt[d], alt2[d]) for d in range(3))
    altn2 = jnp.sqrt(alt[0] ** 2 + alt[1] ** 2 + alt[2] ** 2 + _TINY)
    alt = tuple(alt[d] / altn2 for d in range(3))
    ok1 = n1 > 1e-12
    inv1 = 1.0 / jnp.maximum(n1, _TINY)
    u1 = tuple(jnp.where(ok1, u1r[d] * inv1, alt[d]) for d in range(3))

    u2 = _cross_soa(u0, u1)

    Av2 = matvec(vc2)
    d2 = u2[0] * Av2[0] + u2[1] * Av2[1] + u2[2] * Av2[2]
    sign2 = jnp.where(d2 < 0, -1.0, 1.0).astype(dtype)

    # U columns u_k: U[i, k] = u_k[i]; V columns vc_k
    U = jnp.stack([u0[0], u1[0], u2[0],
                   u0[1], u1[1], u2[1],
                   u0[2], u1[2], u2[2]])
    V = jnp.stack([vc0[0], vc1[0], vc2[0],
                   vc0[1], vc1[1], vc2[1],
                   vc0[2], vc1[2], vc2[2]])
    s = jnp.stack([s0, s1, sign2 * s2])
    return U, s, V


@jax.custom_vjp
def svd3_soa(A):
    """SoA batched SVD: (9, N) -> (U (9, N), s (3, N), V (9, N)); same
    conventions and reference-parity VJP as :func:`svd3`."""
    return _svd3_soa_impl(A)


def _svd3_soa_fwd(A):
    out = _svd3_soa_impl(A)
    return out, out


def _svd3_soa_bwd(res, cotangents):
    from fluidlab_tpu.core import mat3

    U, s, V = res
    gU, gs, gV = cotangents
    s2 = [s[i] * s[i] for i in range(3)]
    # F[i, j] = 1/clamp(s_j^2 - s_i^2), zero diag (reference :284-289)
    F = [
        jnp.zeros_like(s[0]) if i == j
        else 1.0 / _clamp_denominator(s2[j] - s2[i])
        for i in range(3) for j in range(3)
    ]
    F = jnp.stack(F)

    def diag_from(vals):
        z = jnp.zeros_like(vals[0])
        return jnp.stack([vals[0], z, z, z, vals[1], z, z, z, vals[2]])

    S = diag_from([s[0], s[1], s[2]])
    gS = diag_from([gs[0], gs[1], gs[2]])

    S_term = mat3.mm_nt_soa(mat3.mm_soa(U, gS), V)
    inner_u = F * (mat3.mm_tn_soa(U, gU) - mat3.mm_tn_soa(gU, U))
    u_term = mat3.mm_nt_soa(mat3.mm_soa(U, mat3.mm_soa(inner_u, S)), V)
    inner_v = F * (mat3.mm_tn_soa(V, gV) - mat3.mm_tn_soa(gV, V))
    v_term = mat3.mm_soa(U, mat3.mm_soa(S, mat3.mm_nt_soa(inner_v, V)))
    return (u_term + v_term + S_term,)


svd3_soa.defvjp(_svd3_soa_fwd, _svd3_soa_bwd)
