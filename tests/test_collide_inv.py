"""FL_COLLIDE_INV=host must be bit-identical to the on-device inverse.

The host-precomputed R_vox_to_mesh removes a TPU linalg custom-call
from the differentiated grid_op (a pouring-fault candidate, RESULTS
r5).  Values and gradients must not change.
"""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from fluidlab_tpu.engine.sdf import ColliderParams, dynamic_collide


def _make_case(seed=0):
    rng = np.random.default_rng(seed)
    V = 8
    sdf = jnp.asarray(rng.normal(size=(V, V, V)).astype(np.float32))
    grad = jnp.asarray(rng.normal(size=(3, V, V, V)).astype(np.float32))
    A = np.eye(4, dtype=np.float32)
    A[:3, :3] = np.diag([6.0, 5.0, 7.0]) + rng.normal(scale=0.1, size=(3, 3))
    A[:3, 3] = [1.0, 2.0, 0.5]
    col = ColliderParams(
        sdf=sdf, grad=grad, T_mesh_to_voxels=jnp.asarray(A),
        R_vox_to_mesh=jnp.asarray(np.linalg.inv(A[:3, :3].astype(np.float64))
                                  .astype(np.float32)),
    )
    M = 64
    pos = jnp.asarray(rng.uniform(0.2, 0.8, size=(3, M)).astype(np.float32))
    vel = jnp.asarray(rng.normal(scale=0.5, size=(3, M)).astype(np.float32))
    ep = jnp.asarray([0.4, 0.5, 0.6], jnp.float32)
    eq = jnp.asarray([0.9, 0.1, 0.2, 0.1], jnp.float32)
    eq = eq / jnp.linalg.norm(eq)
    epn = ep + 0.01
    eqn = eq
    return col, pos, vel, ep, eq, epn, eqn


@pytest.mark.parametrize("friction", [0.3, 20.0])
def test_host_inverse_matches_device(friction):
    col, pos, vel, ep, eq, epn, eqn = _make_case()

    def run(mode):
        prev = os.environ.get("FL_COLLIDE_INV")
        os.environ["FL_COLLIDE_INV"] = mode

        def f(vel, ep, eq):
            out = dynamic_collide(col, friction, 5.0, pos, vel, ep, eq,
                                  epn, eqn, 1e-3)
            return jnp.sum(out ** 2), out

        try:
            (loss, out), grads = jax.jit(
                lambda v, p, q: jax.value_and_grad(f, argnums=(0, 1, 2),
                                                   has_aux=True)(v, p, q)
            )(vel, ep, eq)
        finally:
            if prev is None:
                os.environ.pop("FL_COLLIDE_INV", None)
            else:
                os.environ["FL_COLLIDE_INV"] = prev
        return out, loss, grads

    out_d, loss_d, g_d = run("device")
    out_h, loss_h, g_h = run("host")
    np.testing.assert_allclose(np.asarray(out_d), np.asarray(out_h),
                               rtol=0, atol=2e-6)
    np.testing.assert_allclose(float(loss_d), float(loss_h), rtol=1e-6)
    for a, b in zip(g_d, g_h):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-4, atol=2e-5)


@pytest.mark.parametrize("friction", [0.3, 20.0])
def test_matrix_impl_matches_plain(friction):
    col, pos, vel, ep, eq, epn, eqn = _make_case(seed=2)

    def run(impl):
        prev = os.environ.get("FL_COLLIDE_IMPL")
        if impl:
            os.environ["FL_COLLIDE_IMPL"] = impl
        else:
            os.environ.pop("FL_COLLIDE_IMPL", None)

        def f(vel, ep, eq, epn, eqn):
            out = dynamic_collide(col, friction, 5.0, pos, vel, ep, eq,
                                  epn, eqn, 1e-3)
            return jnp.sum(out ** 2), out

        try:
            (loss, out), grads = jax.jit(
                lambda v, p, q, pn, qn: jax.value_and_grad(
                    f, argnums=(0, 1, 2, 3, 4), has_aux=True
                )(v, p, q, pn, qn)
            )(vel, ep, eq, epn, eqn)
        finally:
            if prev is None:
                os.environ.pop("FL_COLLIDE_IMPL", None)
            else:
                os.environ["FL_COLLIDE_IMPL"] = prev
        return out, loss, grads

    out_p, loss_p, g_p = run(None)
    out_m, loss_m, g_m = run("matrix")
    np.testing.assert_allclose(np.asarray(out_p), np.asarray(out_m),
                               rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(float(loss_p), float(loss_m), rtol=1e-5)
    for a, b in zip(g_p, g_m):
        a, b = np.asarray(a), np.asarray(b)
        tol = 1e-4 * max(np.abs(a).max(), 1.0)
        np.testing.assert_allclose(a, b, rtol=1e-3, atol=tol)


@pytest.mark.parametrize("friction", [0.3, 20.0])
def test_remat_matches_plain(friction):
    col, pos, vel, ep, eq, epn, eqn = _make_case(seed=1)

    def run(remat):
        prev = os.environ.get("FL_COLLIDE_REMAT")
        if remat:
            os.environ["FL_COLLIDE_REMAT"] = "1"
        else:
            os.environ.pop("FL_COLLIDE_REMAT", None)

        def f(vel, ep, eq):
            out = dynamic_collide(col, friction, 5.0, pos, vel, ep, eq,
                                  epn, eqn, 1e-3)
            return jnp.sum(out ** 2)

        try:
            loss, grads = jax.jit(
                lambda v, p, q: jax.value_and_grad(f, argnums=(0, 1, 2))(
                    v, p, q)
            )(vel, ep, eq)
        finally:
            if prev is None:
                os.environ.pop("FL_COLLIDE_REMAT", None)
            else:
                os.environ["FL_COLLIDE_REMAT"] = prev
        return loss, grads

    loss_p, g_p = run(False)
    loss_r, g_r = run(True)
    np.testing.assert_allclose(float(loss_p), float(loss_r), rtol=1e-6)
    for a, b in zip(g_p, g_r):
        a, b = np.asarray(a), np.asarray(b)
        # relative-to-scale tolerance: the two programs may come from
        # different compilations (persistent-cache AOT vs fresh) whose
        # f32 contraction orders differ slightly; a wrong adjoint would
        # be off at O(scale), not 1e-5 of it (standalone runs diff 0.0)
        tol = 1e-4 * max(np.abs(a).max(), 1.0)
        np.testing.assert_allclose(a, b, rtol=1e-3, atol=tol)
