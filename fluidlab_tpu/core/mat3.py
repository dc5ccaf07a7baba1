"""Batched 3x3 matrix ops without dot_general.

``jnp.einsum`` on (N, 3, 3) operands lowers to a batched ``dot_general``
which TPUs may route through the MXU with massive tile padding (a 3x3
contraction per 128x128 systolic pass).  These helpers express the same
math as broadcast-multiply + sum — pure VPU elementwise work, which is the
right unit for 3x3 chains at particle batch sizes.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp


def matmul3(A, B):
    """(..., 3, 3) @ (..., 3, 3)."""
    return jnp.sum(A[..., :, :, None] * B[..., None, :, :], axis=-2)


def matmul3_nt(A, B):
    """A @ B^T for (..., 3, 3) operands."""
    return jnp.sum(A[..., :, None, :] * B[..., None, :, :], axis=-1)


def matmul3_tn(A, B):
    """A^T @ B for (..., 3, 3) operands."""
    return jnp.sum(A[..., :, :, None] * B[..., :, None, :], axis=-3)


def matvec3(A, v):
    """(..., 3, 3) @ (..., 3)."""
    return jnp.sum(A * v[..., None, :], axis=-1)


def outer3(u, v):
    """(..., 3) outer (..., 3) -> (..., 3, 3)."""
    return u[..., :, None] * v[..., None, :]


def diag_matmul3(U, s, Vt_cols):
    """U @ diag(s) @ V^T given U, s, V as (.., 3, 3)/(.., 3): returns
    sum_k s_k u_k v_k^T."""
    return jnp.sum(
        s[..., None, None, :]
        * U[..., :, None, :]
        * Vt_cols[..., None, :, :],
        axis=-1,
    )


# ---------------------------------------------------------------- SoA form
# TPU tiles the two minor dims to (8, 128); arrays shaped (N, 3) or
# (N, 3, 3) therefore pad 3 -> 128 lanes (42x traffic bloat).  The engine
# stores vectors as (3, N) and matrices as (9, N) [row-major i*3+j] so the
# minor dim is the particle axis.  These helpers implement 3x3 algebra on
# that layout as pure (N,)-wide VPU arithmetic.

def mm_soa(A, B):
    """C = A @ B for (9, N) row-major operands."""
    return jnp.stack([
        sum(A[3 * i + k] * B[3 * k + j] for k in range(3))
        for i in range(3) for j in range(3)
    ])


def mm_nt_soa(A, B):
    """C = A @ B^T."""
    return jnp.stack([
        sum(A[3 * i + k] * B[3 * j + k] for k in range(3))
        for i in range(3) for j in range(3)
    ])


def mm_tn_soa(A, B):
    """C = A^T @ B."""
    return jnp.stack([
        sum(A[3 * k + i] * B[3 * k + j] for k in range(3))
        for i in range(3) for j in range(3)
    ])


def mv_soa(A, v):
    """(9, N) @ (3, N) -> (3, N)."""
    return jnp.stack([
        sum(A[3 * i + k] * v[k] for k in range(3)) for i in range(3)
    ])


def mtv_soa(A, v):
    """A^T v."""
    return jnp.stack([
        sum(A[3 * k + i] * v[k] for k in range(3)) for i in range(3)
    ])


def outer_soa(u, v):
    """(3, N) outer (3, N) -> (9, N)."""
    return jnp.stack([u[i] * v[j] for i in range(3) for j in range(3)])


def diag_mm_soa(U, s, V):
    """U @ diag(s) @ V^T for (9, N), (3, N), (9, N)."""
    return jnp.stack([
        sum(s[k] * U[3 * i + k] * V[3 * j + k] for k in range(3))
        for i in range(3) for j in range(3)
    ])


def det_soa(A):
    """det of (9, N)."""
    return (
        A[0] * (A[4] * A[8] - A[5] * A[7])
        - A[1] * (A[3] * A[8] - A[5] * A[6])
        + A[2] * (A[3] * A[7] - A[4] * A[6])
    )


@functools.partial(jax.custom_vjp, nondiff_argnums=(2,))
def liquid_J_cbrt(c, C, dt):
    """(J, cbrt(J)) for a spherical liquid deformation gradient F = c I:
    J = det((I + dt C) F) = c^3 det(I + dt C) (reference liquid F-update,
    mpm_simulator.py:358-359, with the spherical-F shortcut).

    The closed-form VJP (adjugate for d det, power rule for cbrt) puts an
    opaque boundary around the chain: letting XLA AD build it costs
    +9 ms/substep at 65k on v5e (RESULTS.md r5/r6 elision bisection —
    the SVD custom_vjp it replaced was acting as that boundary)."""
    J, cbrtJ, _, _ = _liquid_J_fwd_impl(c, C, dt)
    return J, cbrtJ


def _liquid_J_fwd_impl(c, C, dt):
    m0 = 1.0 + dt * C[0]
    m1 = dt * C[1]
    m2 = dt * C[2]
    m3 = dt * C[3]
    m4 = 1.0 + dt * C[4]
    m5 = dt * C[5]
    m6 = dt * C[6]
    m7 = dt * C[7]
    m8 = 1.0 + dt * C[8]
    detM = (
        m0 * (m4 * m8 - m5 * m7)
        - m1 * (m3 * m8 - m5 * m6)
        + m2 * (m3 * m7 - m4 * m6)
    )
    J = (c * c * c) * detM
    return J, jnp.cbrt(J), detM, (m0, m1, m2, m3, m4, m5, m6, m7, m8)


def _liquid_J_fwd(c, C, dt):
    J, cbrtJ, detM, _ = _liquid_J_fwd_impl(c, C, dt)
    return (J, cbrtJ), (c, C, detM, cbrtJ)


def _liquid_J_bwd(dt, res, cots):
    c, C, detM, cbrtJ = res
    gJ, gK = cots
    # d cbrt(J)/dJ = 1/(3 cbrt(J)^2); clamp the square so inert lanes
    # (J from inactive-particle garbage, zero cotangent) stay finite.
    k2 = jnp.maximum(cbrtJ * cbrtJ, 1e-20)
    dJ = gJ + gK / (3.0 * k2)
    d_c = dJ * (3.0 * c * c) * detM
    m0 = 1.0 + dt * C[0]
    m1 = dt * C[1]
    m2 = dt * C[2]
    m3 = dt * C[3]
    m4 = 1.0 + dt * C[4]
    m5 = dt * C[5]
    m6 = dt * C[6]
    m7 = dt * C[7]
    m8 = 1.0 + dt * C[8]
    s = dJ * (c * c * c) * dt  # chain: dJ/dC_ij = c^3 dt cof_ij(M)
    d_C = jnp.stack([
        s * (m4 * m8 - m5 * m7),
        s * (m5 * m6 - m3 * m8),
        s * (m3 * m7 - m4 * m6),
        s * (m2 * m7 - m1 * m8),
        s * (m0 * m8 - m2 * m6),
        s * (m1 * m6 - m0 * m7),
        s * (m1 * m5 - m2 * m4),
        s * (m2 * m3 - m0 * m5),
        s * (m0 * m4 - m1 * m3),
    ])
    return d_c, d_C


liquid_J_cbrt.defvjp(_liquid_J_fwd, _liquid_J_bwd)


def eye_soa(n, dtype=jnp.float32):
    """(9, N) identity."""
    out = jnp.zeros((9, n), dtype)
    for d in (0, 4, 8):
        out = out.at[d].set(1.0)
    return out


def aos_to_soa_mat(A):
    """(N, 3, 3) -> (9, N)."""
    return A.reshape(A.shape[0], 9).T


def soa_to_aos_mat(A9):
    """(9, N) -> (N, 3, 3)."""
    return A9.T.reshape(-1, 3, 3)
