"""Unit tests for core math: quaternions, B-splines, 3x3 SVD fwd/bwd.

Mirrors the validation the reference never had (SURVEY.md §4): kernel math
vs closed forms and finite differences.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from fluidlab_tpu.core import bspline, quat, svd3


class TestQuat:
    def test_qmul_identity(self):
        q = jnp.array([1.0, 0.0, 0.0, 0.0])
        r = quat.normalize(jnp.array([0.2, 0.4, -0.1, 0.8]))
        np.testing.assert_allclose(quat.qmul(q, r), r, atol=1e-6)

    def test_qmul_matches_rotation_composition(self):
        rng = np.random.default_rng(0)
        for _ in range(5):
            a = quat.normalize(jnp.asarray(rng.normal(size=4)))
            b = quat.normalize(jnp.asarray(rng.normal(size=4)))
            Rab = quat.quat_to_R(quat.qmul(a, b))
            Ra, Rb = quat.quat_to_R(a), quat.quat_to_R(b)
            np.testing.assert_allclose(Rab, Ra @ Rb, atol=1e-5)

    def test_transform_by_quat_is_rotation(self):
        rng = np.random.default_rng(1)
        q = quat.normalize(jnp.asarray(rng.normal(size=4)))
        v = jnp.asarray(rng.normal(size=3))
        out = quat.transform_by_quat(v, q)
        np.testing.assert_allclose(quat.quat_to_R(q) @ v, out, atol=1e-5)
        np.testing.assert_allclose(
            jnp.linalg.norm(out), jnp.linalg.norm(v), atol=1e-5
        )

    def test_inv_transform_roundtrip(self):
        rng = np.random.default_rng(2)
        q = quat.normalize(jnp.asarray(rng.normal(size=4)))
        t = jnp.asarray(rng.normal(size=3))
        v = jnp.asarray(rng.normal(size=3))
        w = quat.transform_by_trans_quat(v, t, q)
        back = quat.inv_transform_by_trans_quat(w, t, q)
        np.testing.assert_allclose(back, v, atol=1e-5)

    def test_w2quat_small_angle(self):
        w = jnp.array([1e-5, 0.0, 0.0])
        q = quat.w2quat(w)
        np.testing.assert_allclose(q[0], 1.0, atol=1e-6)

    def test_euler_quat_np_vs_R(self):
        e = (30.0, -45.0, 60.0)
        q = quat.euler_to_quat_np(e)
        R1 = quat.euler_to_R_np(e)
        R2 = np.asarray(quat.quat_to_R(jnp.asarray(q)))
        np.testing.assert_allclose(R1, R2, atol=1e-6)


class TestBSpline:
    def test_partition_of_unity(self):
        rng = np.random.default_rng(3)
        x = jnp.asarray(rng.uniform(0.1, 0.9, size=(100, 3)))
        base, fx = bspline.base_and_fx(x, 64.0)
        w = bspline.quadratic_weights(fx)  # (100, 3, 3)
        total = jnp.sum(w, axis=-2)
        np.testing.assert_allclose(total, np.ones((100, 3)), atol=1e-5)
        # full 27-point weights also sum to 1
        w27 = jnp.einsum("pa,pb,pc->pabc",
                         w[:, :, 0], w[:, :, 1], w[:, :, 2]).reshape(100, -1)
        np.testing.assert_allclose(w27.sum(-1), np.ones(100), atol=1e-5)

    def test_fx_range(self):
        x = jnp.asarray(np.random.default_rng(4).uniform(0.05, 0.95, (50, 3)))
        base, fx = bspline.base_and_fx(x, 64.0)
        assert np.all(np.asarray(fx) >= 0.5 - 1e-6)
        assert np.all(np.asarray(fx) <= 1.5 + 1e-6)
        # reconstruction
        np.testing.assert_allclose(
            (np.asarray(base) + np.asarray(fx)) / 64.0, x, atol=1e-6
        )


class TestSVD3:
    def _check_reconstruction(self, A, atol):
        U, s, V = svd3.svd3(jnp.asarray(A))
        U, s, V = np.asarray(U), np.asarray(s), np.asarray(V)
        recon = U @ (s[..., None] * np.swapaxes(V, -1, -2))
        np.testing.assert_allclose(recon, A, atol=atol)
        # U, V proper rotations
        eye = np.broadcast_to(np.eye(3), U.shape)
        np.testing.assert_allclose(U @ np.swapaxes(U, -1, -2), eye, atol=atol)
        np.testing.assert_allclose(V @ np.swapaxes(V, -1, -2), eye, atol=atol)
        np.testing.assert_allclose(np.linalg.det(U), 1.0, atol=atol)
        np.testing.assert_allclose(np.linalg.det(V), 1.0, atol=atol)

    def test_random_batch(self):
        A = np.random.default_rng(5).normal(size=(256, 3, 3)).astype(np.float32)
        self._check_reconstruction(A, 2e-4)

    def test_near_identity(self):
        rng = np.random.default_rng(6)
        A = np.eye(3) + 1e-3 * rng.normal(size=(64, 3, 3))
        self._check_reconstruction(A.astype(np.float32), 1e-5)

    def test_negative_determinant(self):
        A = np.diag([2.0, 1.0, -0.5]).astype(np.float32)[None]
        U, s, V = svd3.svd3(jnp.asarray(A))
        s = np.asarray(s)[0]
        assert s[0] >= abs(s[1]) >= abs(s[2])
        assert np.prod(s) < 0  # sign of det(A)
        self._check_reconstruction(A, 1e-5)

    def test_singular_values_match_numpy(self):
        A = np.random.default_rng(7).normal(size=(64, 3, 3)).astype(np.float32)
        _, s, _ = svd3.svd3(jnp.asarray(A))
        s_np = np.linalg.svd(A, compute_uv=False)
        np.testing.assert_allclose(np.abs(np.asarray(s)), s_np, atol=2e-4)

    def test_identity(self):
        A = jnp.eye(3)[None]
        U, s, V = svd3.svd3(A)
        np.testing.assert_allclose(np.asarray(s), [[1.0, 1.0, 1.0]], atol=1e-6)

    @pytest.mark.parametrize("seed", [0, 1])
    def test_gradient_vs_finite_difference(self, seed):
        """d(sum s)/dA and corotated-R gradients vs central differences."""
        rng = np.random.default_rng(seed)
        A0 = np.eye(3) + 0.1 * rng.normal(size=(3, 3))
        A0 = A0.astype(np.float32)

        def loss_s(A):
            _, s, _ = svd3.svd3(A)
            return jnp.sum(s * jnp.array([1.0, 2.0, 3.0]))

        def loss_R(A):
            U, s, V = svd3.svd3(A)
            R = U @ jnp.swapaxes(V, -1, -2)
            return jnp.sum(R * jnp.arange(9.0).reshape(3, 3))

        for loss in (loss_s, loss_R):
            g = np.asarray(jax.grad(loss)(jnp.asarray(A0)))
            eps = 1e-3
            fd = np.zeros((3, 3))
            for i in range(3):
                for j in range(3):
                    Ap, Am = A0.copy(), A0.copy()
                    Ap[i, j] += eps
                    Am[i, j] -= eps
                    fd[i, j] = (loss(jnp.asarray(Ap)) - loss(jnp.asarray(Am))) / (
                        2 * eps
                    )
            np.testing.assert_allclose(g, fd, atol=5e-2, rtol=5e-2)

    def test_vmap_jit(self):
        A = jnp.asarray(
            np.random.default_rng(8).normal(size=(32, 3, 3)).astype(np.float32)
        )
        U1, s1, V1 = jax.jit(svd3.svd3)(A)
        U2, s2, V2 = jax.vmap(svd3.svd3)(A)
        np.testing.assert_allclose(np.asarray(s1), np.asarray(s2), atol=1e-5)


class TestLiquidJCbrt:
    """liquid_J_cbrt (closed-form det/cbrt VJP, core/mat3.py) vs XLA AD
    of the explicit composition."""

    def test_fwd_and_grad_match_xla(self):
        import jax
        import jax.numpy as jnp
        import numpy as np

        from fluidlab_tpu.core.mat3 import det_soa, eye_soa, liquid_J_cbrt

        rng = np.random.RandomState(2)
        N, dt = 128, 2e-4
        c = jnp.asarray(rng.uniform(0.9, 1.1, N), jnp.float32)
        C = jnp.asarray(rng.normal(0.0, 3.0, (9, N)), jnp.float32)
        w1 = jnp.asarray(rng.normal(size=N), jnp.float32)
        w2 = jnp.asarray(rng.normal(size=N), jnp.float32)

        def ref(c_, C_):
            J = c_ ** 3 * det_soa(eye_soa(N) + dt * C_)
            return J, jnp.cbrt(J)

        J1, K1 = jax.jit(lambda a, b: liquid_J_cbrt(a, b, dt))(c, C)
        J0, K0 = ref(c, C)
        np.testing.assert_allclose(J1, J0, rtol=1e-6)
        np.testing.assert_allclose(K1, K0, rtol=1e-6)

        def lk(a, b):
            J, K = liquid_J_cbrt(a, b, dt)
            return jnp.sum(w1 * J + w2 * K)

        def lr(a, b):
            J, K = ref(a, b)
            return jnp.sum(w1 * J + w2 * K)

        gk = jax.jit(jax.grad(lk, argnums=(0, 1)))(c, C)
        gr = jax.jit(jax.grad(lr, argnums=(0, 1)))(c, C)
        np.testing.assert_allclose(gk[0], gr[0], rtol=1e-5, atol=1e-7)
        np.testing.assert_allclose(gk[1], gr[1], rtol=1e-5, atol=1e-7)
