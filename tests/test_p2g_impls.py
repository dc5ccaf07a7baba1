"""P2G implementation equivalence (SoA layout): scatter vs sort vs pallas."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from fluidlab_tpu.core.bspline import base_and_fx_soa, quadratic_weights_soa
from fluidlab_tpu.ops.p2g import p2g_scatter, p2g_sort


@pytest.fixture(scope="module")
def inputs():
    G = 32
    N = 1500
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.uniform(0.1, 0.9, (3, N)).astype(np.float32))
    base, fx = base_and_fx_soa(x, float(G))
    base = jnp.clip(base, 0, G - 3)
    w = quadratic_weights_soa(fx)
    usedf = jnp.asarray((rng.uniform(size=N) > 0.2).astype(np.float32))
    mass = jnp.asarray(rng.uniform(0.5, 2.0, N).astype(np.float32))
    v = jnp.asarray(rng.normal(size=(3, N)).astype(np.float32))
    affine = jnp.asarray(0.1 * rng.normal(size=(9, N)).astype(np.float32))
    return base, fx, w, usedf, mass, v, affine, G, 1.0 / G


def test_sort_matches_scatter(inputs):
    a = p2g_scatter(*inputs)
    b = p2g_sort(*inputs)
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-5)


def test_mass_conservation(inputs):
    base, fx, w, usedf, mass, v, affine, G, dx = inputs
    grid = p2g_scatter(*inputs)
    total = float(jnp.sum(grid[3]))
    expected = float(jnp.sum(mass * usedf))
    np.testing.assert_allclose(total, expected, rtol=1e-5)


def test_momentum_conservation(inputs):
    base, fx, w, usedf, mass, v, affine, G, dx = inputs
    grid = p2g_scatter(*inputs)
    total = np.asarray(jnp.sum(grid[:3], axis=1))
    expected = np.asarray(
        jnp.stack([jnp.sum(mass * v[i] * usedf) for i in range(3)])
    )
    np.testing.assert_allclose(total, expected, rtol=1e-4, atol=1e-4)


def test_gradients_match(inputs):
    base, fx, w, usedf, mass, v, affine, G, dx = inputs

    def loss(fn, v_, a_):
        g = fn(base, fx, w, usedf, mass, v_, a_, G, dx)
        return jnp.sum(g[:3] * 0.3 + g[3:] * 0.1)

    g1 = jax.grad(lambda v_, a_: loss(p2g_scatter, v_, a_), argnums=(0, 1))(
        v, affine
    )
    g2 = jax.grad(lambda v_, a_: loss(p2g_sort, v_, a_), argnums=(0, 1))(
        v, affine
    )
    for a, b in zip(g1, g2):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-5)


def test_pallas_matches_scatter(inputs):
    from fluidlab_tpu.ops.p2g_pallas import p2g_pallas

    a = p2g_scatter(*inputs)
    b = p2g_pallas(*inputs, interpret=True)
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=2e-5)


def test_pallas_gradients_match(inputs):
    from fluidlab_tpu.ops.p2g_pallas import p2g_pallas

    base, fx, w, usedf, mass, v, affine, G, dx = inputs

    def loss(fn, v_, a_):
        g = fn(base, fx, w, usedf, mass, v_, a_, G, dx)
        ch = (jnp.arange(4.0) + 0.5)[:, None]
        return jnp.sum(g * ch)

    g1 = jax.grad(lambda v_, a_: loss(p2g_scatter, v_, a_), argnums=(0, 1))(
        v, affine
    )
    g2 = jax.grad(
        lambda v_, a_: loss(
            lambda *args: p2g_pallas(*args, interpret=True), v_, a_
        ),
        argnums=(0, 1),
    )(v, affine)
    for a, b in zip(g1, g2):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=2e-5)
