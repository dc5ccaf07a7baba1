"""2-D ('space', 'rollout') mesh composition (parallel/mesh2d.py).

The 2x2 sharded multi-start train step must reproduce the 1x1
(unsharded) result with identical inputs: same winner, same losses,
same Adam-updated base trajectory — the collectives (grid psum per
substep over 'space', loss all_gather + winner psum over 'rollout')
are exact reorderings of the unsharded sums up to f32 association.

Portable transfer impls only: interpret-mode pallas under >= 4
multi-replica shard_map starves the 4-vCPU host thread pool
(tests/test_spatial.py note).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from fluidlab_tpu.parallel.mesh2d import (
    make_mesh2d,
    make_multistart_spatial_train_step,
)
from fluidlab_tpu.utils.bench_scenes import liquid_agent_scene

pytestmark = pytest.mark.skipif(
    len(jax.devices()) < 4, reason="needs 4 virtual devices"
)

K = 4
HA = 2


def _loss(s, p):
    # depends on the particles AND (through the effector pose) on the
    # actions, so the winner's gradient is nonzero even though the
    # bench scene's effector has collide_type=None
    return (s.particles.x[1] - s.effectors[0].pos[1]) ** 2


def _mk(n_space, n_rollout):
    sim = liquid_agent_scene(n_particles=256, horizon=2)
    mesh = make_mesh2d(n_space, n_rollout)
    ts = make_multistart_spatial_train_step(
        sim.cfg, mesh, sim.init_state, sim.params,
        horizon_action=HA, action_range=(-0.05, 0.05),
        per_particle_loss=_loss,
        n_rollouts=K, lr=1e-3,
    )
    return ts


def _inputs(seed=0):
    rng = np.random.default_rng(seed)
    base_v = jnp.zeros((HA, 3), jnp.float32)
    base_p = jnp.full((3,), 0.5, jnp.float32)
    shape = (HA + 1, 3)
    opt = (jnp.zeros(shape, jnp.float32), jnp.zeros(shape, jnp.float32),
           jnp.zeros((), jnp.int32))
    noise = rng.normal(size=(K, HA, 3)).astype(np.float32) * 1e-3
    noise[0] = 0.0
    return base_v, base_p, opt, jnp.asarray(noise)


def test_2d_matches_unsharded():
    out_1 = _mk(1, 1)(*_inputs())
    out_2 = _mk(2, 2)(*_inputs())
    for a, b in zip(jax.tree_util.tree_leaves(out_1),
                    jax.tree_util.tree_leaves(out_2)):
        np.testing.assert_allclose(
            np.asarray(b), np.asarray(a), atol=1e-5, rtol=1e-4
        )


def test_2d_iterates_and_descends():
    ts = _mk(2, 2)
    base_v, base_p, opt, noise = _inputs()
    losses = []
    for it in range(3):
        base_v, base_p, opt, best, all_l = ts(base_v, base_p, opt, noise)
        losses.append(float(best))
        assert np.asarray(all_l).shape == (K,)
    assert np.all(np.isfinite(losses))
    # Adam moved the base and the step count advanced
    assert int(opt[2]) == 3
    assert float(jnp.abs(base_v).max()) > 0


def test_rollout_divisibility_checked():
    sim = liquid_agent_scene(n_particles=256, horizon=2)
    mesh = make_mesh2d(1, 3)
    with pytest.raises(ValueError, match="divide"):
        make_multistart_spatial_train_step(
            sim.cfg, mesh, sim.init_state, sim.params,
            horizon_action=HA, action_range=(-0.05, 0.05),
            per_particle_loss=_loss,
            n_rollouts=K,
        )
