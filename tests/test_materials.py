"""Material-model behavior tests: elastic, plastic, rigid shape matching.

Behavioral invariants of the reference material branches
(mpm_simulator.py:355-378, 449-505) that don't require golden data.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from fluidlab_tpu.config import materials as M
from fluidlab_tpu.engine.config import SimCfg
from fluidlab_tpu.engine.rollout import make_rollout
from fluidlab_tpu.engine.scene import SceneParams, particle_params_from_properties
from fluidlab_tpu.engine.types import ParticleState, SimState


def build_scene(mat_id, n=512, gravity=(0.0, -10.0, 0.0), horizon=20,
                lower=0.35, upper=0.65, v0=None, seed=0, y_range=None):
    cfg = SimCfg(n_particles=n, n_bodies=1, horizon=horizon, gravity=gravity,
                 has_rigid_bodies=(M.MAT_CLASS_TABLE[mat_id] == M.MAT_RIGID))
    rng = np.random.default_rng(seed)
    x = rng.uniform(lower, upper, size=(3, n)).astype(np.float32)
    if y_range is not None:
        x[1] = rng.uniform(y_range[0], y_range[1], size=n)
    mat = np.full(n, mat_id, dtype=np.int32)
    rho = np.full(n, M.RHO[mat_id], dtype=np.float32)
    body = np.zeros(n, dtype=np.int32)
    params = SceneParams(**particle_params_from_properties(mat, rho, body, cfg))
    v = np.zeros((3, n), np.float32) if v0 is None else np.tile(
        np.asarray(v0, np.float32)[:, None], (1, n)
    )
    F0 = np.zeros((9, n), np.float32)
    F0[[0, 4, 8]] = 1.0
    state = SimState(
        particles=ParticleState(
            x=jnp.asarray(x), v=jnp.asarray(v.astype(np.float32)),
            C=jnp.zeros((9, n), jnp.float32),
            F=jnp.asarray(F0),
            used=jnp.ones((n,), bool),
        ),
        effectors=(), smoke=None, f_global=jnp.zeros((), jnp.int32),
    )
    return cfg, params, state


def run(cfg, params, state, steps):
    rollout = jax.jit(make_rollout(cfg))
    final, _ = rollout(state, params, jnp.zeros((steps, 1), jnp.float32))
    return final


class TestElastic:
    def test_F_tracks_deformation(self):
        """Falling elastic block: on impact F deviates from identity
        (stores elastic strain) — liquids would reset F each substep."""
        # block resting just above the floor so it impacts immediately
        cfg, params, state = build_scene(M.ELASTIC, horizon=60,
                                         lower=0.35, upper=0.55,
                                         y_range=(0.06, 0.26))
        final = run(cfg, params, state, 60)
        F = np.asarray(final.particles.F)  # (9, N)
        eye = np.zeros((9, 1), np.float32)
        eye[[0, 4, 8]] = 1.0
        dev = np.abs(F - eye).max()
        assert np.isfinite(F).all()
        assert dev > 1e-3  # strained on impact

    def test_momentum_free_flight(self):
        """Zero gravity, uniform initial velocity: block translates
        rigidly, mean velocity preserved."""
        cfg, params, state = build_scene(
            M.ELASTIC, gravity=(0.0, 0.0, 0.0), v0=np.array([0.2, 0.0, 0.0]),
            horizon=10,
        )
        final = run(cfg, params, state, 10)
        v = np.asarray(final.particles.v)  # (3, N)
        np.testing.assert_allclose(v.mean(1), [0.2, 0, 0], atol=1e-3)
        # traveled ~ v * t = 0.2 * 10 steps * 2ms = 0.004
        dx = np.asarray(final.particles.x).mean(1) - np.asarray(
            state.particles.x
        ).mean(1)
        np.testing.assert_allclose(dx, [0.004, 0, 0], atol=5e-4)


class TestPlastic:
    def test_yield_limits_singular_values(self):
        """Von-Mises box plasticity: F's singular values stay inside the
        clamp band (reference :367-376) no matter the deformation."""
        cfg, params, state = build_scene(M.ICECREAM, horizon=80,
                                         lower=0.35, upper=0.55)
        final = run(cfg, params, state, 80)
        from fluidlab_tpu.core.svd3 import svd3_soa

        _, s, _ = svd3_soa(final.particles.F)
        s = np.abs(np.asarray(s))
        assert s.max() <= 1.0 + 3e-3 + 1e-4
        assert s.min() >= 1.0 - 2e-3 - 1e-4


class TestRigid:
    def test_shape_preserved_under_fall(self):
        """Rigid shape matching keeps pairwise distances while falling."""
        cfg, params, state = build_scene(
            M.RIGID, n=256, horizon=50, lower=0.4, upper=0.5
        )
        x0 = np.asarray(state.particles.x).T  # (N, 3)
        final = run(cfg, params, state, 50)
        x1 = np.asarray(final.particles.x).T
        # fell
        assert x1[:, 1].mean() < x0[:, 1].mean() - 0.002
        # distances preserved (sample pairs)
        idx = np.random.default_rng(0).integers(0, 256, size=(40, 2))
        d0 = np.linalg.norm(x0[idx[:, 0]] - x0[idx[:, 1]], axis=1)
        d1 = np.linalg.norm(x1[idx[:, 0]] - x1[idx[:, 1]], axis=1)
        np.testing.assert_allclose(d1, d0, atol=2e-3)


class TestLiquidVsViscous:
    def test_viscous_spreads_less(self):
        """MILK_VIS (mu=200) must spread less than WATER (mu=0) after
        collapsing under gravity (reference MU table, macros.py:143-161)."""

        def spread(mat_id):
            cfg, params, state = build_scene(
                mat_id, n=800, horizon=150, lower=0.42, upper=0.58, seed=1,
                y_range=(0.06, 0.3),
            )
            final = run(cfg, params, state, 150)
            x = np.asarray(final.particles.x)  # (3, N)
            return x[[0, 2]].std()

        assert spread(M.WATER) > spread(M.MILK_VIS) * 1.02
