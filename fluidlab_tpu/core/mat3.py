"""Batched 3x3 matrix ops without dot_general.

``jnp.einsum`` on (N, 3, 3) operands lowers to a batched ``dot_general``
which TPUs may route through the MXU with massive tile padding (a 3x3
contraction per 128x128 systolic pass).  These helpers express the same
math as broadcast-multiply + sum — pure VPU elementwise work, which is the
right unit for 3x3 chains at particle batch sizes.
"""

from __future__ import annotations

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
