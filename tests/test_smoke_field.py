"""Eulerian smoke field tests: projection quality, advection sanity,
differentiability (reference smoke_field.py semantics)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from fluidlab_tpu.engine.config import AgentCfg, EffectorCfg, SimCfg, SmokeCfg
from fluidlab_tpu.engine.boundaries import CubeBoundary
from fluidlab_tpu.engine.scene import SceneParams
from fluidlab_tpu.engine.smoke import (
    compute_free_mask,
    init_smoke_state,
    make_smoke_step,
)
from fluidlab_tpu.engine.types import SimState, init_effector_state


def build_smoke_sim(res=32, iters=30, lower_y=8, higher_y=24):
    smoke_cfg = SmokeCfg(
        res=res, dt=0.03, solver_iters=iters, q_dim=1,
        lower_y=lower_y, higher_y=higher_y,
    )
    aircon = EffectorCfg(
        kind="aircon", action_dim=8,
        action_scale_v=(1.0, 1.0, 1.0, 1.0, 1.0, 1.0, 1e5, 50.0),
        boundary=CubeBoundary(), init_pos=(0.8, 0.5, 0.5),
        inject_v=(-0.3, 0.0, 1.0),  # reference aircon.py:16
    )
    agent = AgentCfg(effectors=(aircon,), collide_type=None)
    cfg = SimCfg(n_particles=0, horizon=4, agent=agent, smoke=smoke_cfg)
    free = compute_free_mask(smoke_cfg, [])
    params = SceneParams(
        smoke_free=free, colliders=(None,), inj_rand=(None,),
        inj_act_range=(None,),
    )
    eff = init_effector_state((0.5, 0.5, 0.5), (1.0, 0.0, 0.0, 0.0))
    eff = eff.replace(
        s=jnp.float32(2000.0), r=jnp.float32(2.0)
    )
    state = SimState(
        particles=None, effectors=(eff,),
        smoke=init_smoke_state(smoke_cfg), f_global=jnp.zeros((), jnp.int32),
    )
    return cfg, params, state


class TestSmoke:
    @pytest.fixture(scope="class")
    def stepped(self):
        cfg, params, state = build_smoke_sim()
        step = jax.jit(make_smoke_step(cfg))
        s = state
        for _ in range(3):
            s = step(s, params)
        return cfg, params, state, s

    def test_no_nans(self, stepped):
        _, _, _, s = stepped
        for leaf in (s.smoke.v, s.smoke.q, s.smoke.p):
            assert np.isfinite(np.asarray(leaf)).all()

    def test_impulse_creates_velocity(self, stepped):
        _, _, _, s = stepped
        assert np.abs(np.asarray(s.smoke.v)).max() > 1e-4

    def test_velocity_zero_outside_free(self, stepped):
        cfg, params, _, s = stepped
        free = np.asarray(params.smoke_free)
        v = np.asarray(s.smoke.v)  # (3, R, R, R)
        assert np.abs(v[:, ~free]).max() == 0.0

    def test_projection_reduces_divergence(self):
        """After pressure projection the free-space central-difference
        divergence must be much smaller than before."""
        cfg, params, state = build_smoke_sim(iters=60)
        step = jax.jit(make_smoke_step(cfg))
        s1 = step(state, params)
        free = np.asarray(params.smoke_free)
        v = np.asarray(s1.smoke.v)  # (3, R, R, R)

        div = (
            (np.roll(v[0], -1, 0) - np.roll(v[0], 1, 0))
            + (np.roll(v[1], -1, 1) - np.roll(v[1], 1, 1))
            + (np.roll(v[2], -1, 2) - np.roll(v[2], 1, 2))
        ) * 0.5
        interior = free.copy()
        for ax in range(3):
            interior &= np.roll(free, 1, ax) & np.roll(free, -1, ax)
        div_rms = np.sqrt((div[interior] ** 2).mean())
        v_rms = np.sqrt((v[:, free] ** 2).sum(0).mean())
        assert div_rms < 0.1 * max(v_rms, 1e-9)

    def test_temperature_cooled_near_aircon(self, stepped):
        """AirCon relaxes q toward low_T with exp(-d/r) factor
        (reference :229)."""
        cfg, params, state, s = stepped
        q0 = np.asarray(state.smoke.q)  # (Q, R, R, R)
        q1 = np.asarray(s.smoke.q)
        # near the aircon (cell 16, y inside slab)
        assert q1[0, 16, 16, 16] < q0[0, 16, 16, 16]

    def test_differentiable_wrt_aircon_strength(self):
        cfg, params, state = build_smoke_sim(iters=10)
        step = make_smoke_step(cfg)

        def loss(strength):
            eff = state.effectors[0].replace(s=strength)
            st = state.replace(effectors=(eff,))
            st = step(st, params)
            st = step(st, params)
            # velocity functional: directly sensitive to the impulse
            return jnp.mean(jnp.abs(st.smoke.v))

        g = float(jax.jit(jax.grad(loss))(jnp.float32(2000.0)))
        assert np.isfinite(g) and abs(g) > 0

        eps = 100.0
        f = jax.jit(loss)
        fd = (
            float(f(jnp.float32(2000.0 + eps)))
            - float(f(jnp.float32(2000.0 - eps)))
        ) / (2 * eps)
        np.testing.assert_allclose(g, fd, rtol=0.05)


class TestTrilerpZpair:
    """FL_TRILERP=zpair (length-2 z-slice gathers) must match the
    8-corner gather implementation bit-exactly in the forward."""

    def test_matches_corner_impl(self):
        from fluidlab_tpu.engine.smoke import _trilerp, _trilerp_zpair

        R = 16
        rng = np.random.RandomState(3)
        field = jnp.asarray(rng.normal(size=(4, R, R, R)), jnp.float32)
        # interior, near-edge, and far out-of-bounds sample positions
        p = jnp.asarray(
            rng.uniform(-3.0, R + 3.0, size=(3, R, R, R)), jnp.float32
        )
        a = jax.jit(_trilerp)(field, p)
        b = jax.jit(_trilerp_zpair)(field, p)
        assert float(jnp.max(jnp.abs(a - b))) == 0.0
        ga = jax.grad(lambda f: jnp.sum(jnp.sin(_trilerp(f, p))))(field)
        gb = jax.grad(lambda f: jnp.sum(jnp.sin(_trilerp_zpair(f, p))))(field)
        np.testing.assert_allclose(ga, gb, rtol=2e-5, atol=2e-5)


class TestTrilerpStencil:
    """FL_TRILERP=stencil (gather-free tent-weight stencil) must match
    the 8-corner gather implementation for advection-style positions
    (within its D-cell displacement contract), including backtraces that
    land outside the domain near the boundary."""

    def _positions(self, R, D, rng):
        ii, jj, kk = np.meshgrid(
            np.arange(R), np.arange(R), np.arange(R), indexing="ij"
        )
        centers = np.stack([ii, jj, kk]).astype(np.float32) + 0.5
        # displacements up to D cells (the contract), incl. pushing
        # boundary cells' samples out of the domain entirely
        disp = rng.uniform(-D, D, size=(3, R, R, R)).astype(np.float32)
        return jnp.asarray(centers + disp)

    def test_matches_corner_impl(self):
        from fluidlab_tpu.engine.smoke import _trilerp, _trilerp_stencil

        R, D = 16, 2
        rng = np.random.RandomState(7)
        field = jnp.asarray(rng.normal(size=(4, R, R, R)), jnp.float32)
        p = self._positions(R, D, rng)
        a = jax.jit(_trilerp)(field, p)
        b = jax.jit(lambda f, q: _trilerp_stencil(f, q, D=D))(field, p)
        np.testing.assert_allclose(a, b, rtol=1e-5, atol=1e-5)

    def test_gradients_match(self):
        from fluidlab_tpu.engine.smoke import _trilerp, _trilerp_stencil

        R, D = 8, 2
        rng = np.random.RandomState(11)
        field = jnp.asarray(rng.normal(size=(2, R, R, R)), jnp.float32)
        p = self._positions(R, D, rng)

        def la(f):
            return jnp.sum(jnp.sin(_trilerp(f, p)))

        def lb(f):
            return jnp.sum(jnp.sin(_trilerp_stencil(f, p, D=D)))

        ga = jax.jit(jax.grad(la))(field)
        gb = jax.jit(jax.grad(lb))(field)
        np.testing.assert_allclose(ga, gb, rtol=2e-4, atol=2e-5)

    def test_grad_wrt_positions_matches(self):
        """The advection adjoint also differentiates through p."""
        from fluidlab_tpu.engine.smoke import _trilerp, _trilerp_stencil

        R, D = 8, 2
        rng = np.random.RandomState(13)
        field = jnp.asarray(rng.normal(size=(1, R, R, R)), jnp.float32)
        # keep positions strictly inside cells (trilerp is not
        # differentiable at integer corners; both impls kink there)
        ii, jj, kk = np.meshgrid(
            np.arange(R), np.arange(R), np.arange(R), indexing="ij"
        )
        centers = np.stack([ii, jj, kk]).astype(np.float32) + 0.5
        disp = rng.uniform(-1.2, 1.2, size=(3, R, R, R)).astype(np.float32)
        disp = np.clip(np.round(disp * 4) / 4 + 0.11, -1.4, 1.4)
        p = jnp.asarray(centers + disp)

        ga = jax.jit(jax.grad(lambda q: jnp.sum(jnp.cos(_trilerp(field, q)))))(p)
        gb = jax.jit(
            jax.grad(
                lambda q: jnp.sum(jnp.cos(_trilerp_stencil(field, q, D=D)))
            )
        )(p)
        # interior cells only: at the domain boundary the two impls
        # clamp in value-equivalent but differently-parameterized ways
        sl = (slice(None),) + (slice(2, R - 2),) * 3
        np.testing.assert_allclose(ga[sl], gb[sl], rtol=2e-4, atol=2e-5)
