"""Pallas smoke kernels (ops/smoke_pallas.py) vs the XLA stencil path:
forward parity, custom-VJP gradient parity (the Jacobi adjoint relies on
exact symmetry of the redirect operator), and an end-to-end smoke step
in interpreter mode."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from fluidlab_tpu.ops import smoke_pallas
from fluidlab_tpu.engine import smoke as smoke_mod


def _rand_field(rng, C, R):
    return jnp.asarray(rng.normal(size=(C, R, R, R)), jnp.float32)


class TestAdvectKernel:
    R, S, D = 16, 4, 2
    dt = 0.5  # cells of displacement ~ dt * |v| <= ~1.5 < D

    def test_forward_matches_ref(self):
        rng = np.random.RandomState(5)
        vq = _rand_field(rng, 4, self.R)
        out_k = jax.jit(
            lambda a: smoke_pallas.advect_rk3(
                a, self.dt, self.D, self.S, True
            )
        )(vq)
        out_r = jax.jit(
            lambda a: smoke_pallas._advect_ref(a, self.dt, self.D)
        )(vq)
        np.testing.assert_allclose(out_k, out_r, rtol=2e-5, atol=2e-5)

    @pytest.mark.parametrize("s_bwd", ["1", "4"])
    def test_grad_matches_ref(self, s_bwd, monkeypatch):
        # s_bwd sweeps the split-backward slab (window w = ceil(2D/S)):
        # 1 -> 9-block windows, 4 -> 3-block windows
        monkeypatch.setenv("FL_SMOKE_BWD_S", s_bwd)
        rng = np.random.RandomState(6)
        vq = _rand_field(rng, 4, self.R)
        w = _rand_field(rng, 4, self.R)

        def lk(a):
            return jnp.sum(
                w * smoke_pallas.advect_rk3(a, self.dt, self.D, self.S, True)
            )

        def lr(a):
            return jnp.sum(w * smoke_pallas._advect_ref(a, self.dt, self.D))

        gk = jax.jit(jax.grad(lk))(vq)
        gr = jax.jit(jax.grad(lr))(vq)
        np.testing.assert_allclose(gk, gr, rtol=2e-4, atol=2e-5)

    def test_uneven_slab_grid(self):
        # R not divisible by 8 exercises the slab fallback in the step
        # builder; the kernel itself requires S | R.
        rng = np.random.RandomState(7)
        vq = _rand_field(rng, 4, 12)
        out_k = smoke_pallas.advect_rk3(vq, self.dt, self.D, 4, True)
        out_r = smoke_pallas._advect_ref(vq, self.dt, self.D)
        np.testing.assert_allclose(out_k, out_r, rtol=2e-5, atol=2e-5)


def _jacobi_xla(p0, div, free, iters):
    """Reference loop: exactly smoke.py's jacobi_iter sequence."""

    def body(pf, _):
        nb_sum = (
            smoke_mod._neighbor_redirect(pf, free, 0, 1)
            + smoke_mod._neighbor_redirect(pf, free, 0, -1)
            + smoke_mod._neighbor_redirect(pf, free, 1, 1)
            + smoke_mod._neighbor_redirect(pf, free, 1, -1)
            + smoke_mod._neighbor_redirect(pf, free, 2, 1)
            + smoke_mod._neighbor_redirect(pf, free, 2, -1)
        )
        return jnp.where(free, (nb_sum - div) / 6.0, 0.0), None

    out, _ = jax.lax.scan(body, p0, None, length=iters)
    return out


class TestJacobiKernel:
    R, iters = 16, 12

    def _setup(self, seed=9):
        rng = np.random.RandomState(seed)
        R = self.R
        free_np = rng.rand(R, R, R) > 0.25
        free_np[:, :3, :] = False
        free = jnp.asarray(free_np)
        p_prev = jnp.asarray(rng.normal(size=(R, R, R)), jnp.float32)
        div = jnp.asarray(rng.normal(size=(R, R, R)), jnp.float32)
        div = jnp.where(free, div, 0.0)
        return free, p_prev, div

    def test_forward_matches_xla(self):
        free, p_prev, div = self._setup()
        p0 = jnp.where(free, p_prev, 0.0)
        out_k = jax.jit(
            lambda p, d: smoke_pallas.jacobi_project(
                p, d, free.astype(jnp.float32), self.iters, True
            )
        )(p0, div)
        out_r = jax.jit(lambda p, d: _jacobi_xla(p, d, free, self.iters))(
            p0, div
        )
        np.testing.assert_allclose(out_k, out_r, rtol=1e-5, atol=1e-6)

    def test_adjoint_matches_xla_grad(self):
        """The symmetric-operator VJP (same kernel, div=0, + accumulator)
        must agree with JAX AD through the XLA loop for BOTH p0 and div."""
        free, p_prev, div = self._setup(11)
        rng = np.random.RandomState(12)
        w = jnp.asarray(
            rng.normal(size=(self.R,) * 3), jnp.float32
        )

        def lk(pp, d):
            p0 = jnp.where(free, pp, 0.0)
            return jnp.sum(
                w
                * smoke_pallas.jacobi_project(
                    p0, d, free.astype(jnp.float32), self.iters, True
                )
            )

        def lr(pp, d):
            p0 = jnp.where(free, pp, 0.0)
            return jnp.sum(w * _jacobi_xla(p0, d, free, self.iters))

        gk = jax.jit(jax.grad(lk, argnums=(0, 1)))(p_prev, div)
        gr = jax.jit(jax.grad(lr, argnums=(0, 1)))(p_prev, div)
        np.testing.assert_allclose(gk[0], gr[0], rtol=2e-5, atol=1e-6)
        np.testing.assert_allclose(gk[1], gr[1], rtol=2e-5, atol=1e-6)


class TestSmokeStepPallas:
    """End-to-end smoke step with FL_SMOKE_IMPL=pallas_interpret equals
    the default XLA path (forward and gradient)."""

    def _build(self):
        from tests.test_smoke_field import build_smoke_sim

        return build_smoke_sim(res=16, iters=8, lower_y=4, higher_y=12)

    def test_step_and_grad_match(self, monkeypatch):
        cfg, params, state = self._build()

        def run_fwd_and_grad():
            step = make = smoke_mod.make_smoke_step(cfg)
            s1 = jax.jit(lambda s: make(s, params))(state)

            def loss(strength):
                eff = state.effectors[0].replace(s=strength)
                st = state.replace(effectors=(eff,))
                st = step(st, params)
                st = step(st, params)
                return jnp.mean(jnp.abs(st.smoke.v)) + jnp.mean(st.smoke.q)

            g = float(jax.jit(jax.grad(loss))(jnp.float32(2000.0)))
            return s1, g

        monkeypatch.setenv("FL_SMOKE_IMPL", "xla")
        s_ref, g_ref = run_fwd_and_grad()
        monkeypatch.setenv("FL_SMOKE_IMPL", "pallas_interpret")
        s_pl, g_pl = run_fwd_and_grad()

        np.testing.assert_allclose(
            s_pl.smoke.v, s_ref.smoke.v, rtol=2e-4, atol=2e-6
        )
        np.testing.assert_allclose(
            s_pl.smoke.q, s_ref.smoke.q, rtol=2e-4, atol=2e-6
        )
        np.testing.assert_allclose(
            s_pl.smoke.p, s_ref.smoke.p, rtol=2e-4, atol=2e-6
        )
        assert np.isfinite(g_pl)
        np.testing.assert_allclose(g_pl, g_ref, rtol=5e-3)
