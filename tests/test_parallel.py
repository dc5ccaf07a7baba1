"""Multi-start planner tests on a virtual 8-device CPU mesh (SURVEY.md §4:
the standard way to exercise shard_map/GSPMD collectives in CI)."""

import jax
import numpy as np
import pytest

from fluidlab_tpu.parallel.planner import MultiStartPlanner, make_rollout_mesh
from fluidlab_tpu.utils.bench_scenes import liquid_agent_scene


@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 virtual devices")
class TestMultiStartPlanner:
    def test_sharded_matches_unsharded(self):
        """Same seed -> identical best losses with and without the mesh."""
        def run(mesh):
            sim = liquid_agent_scene(n_particles=256, horizon=2)
            planner = MultiStartPlanner(
                sim, horizon_action=2, action_range=(-0.05, 0.05),
                n_rollouts=8, noise_scale=1e-2, lr=1e-2, mesh=mesh, seed=7,
            )
            v = np.zeros((2, 3), np.float32)
            p = np.full((3,), 0.5, np.float32)
            opt = planner.init_opt_state()
            _, _, _, best, losses = planner.step(v, p, opt)
            return best, np.asarray(losses)

        best_m, losses_m = run(make_rollout_mesh(8))
        best_0, losses_0 = run(None)
        np.testing.assert_allclose(losses_m, losses_0, rtol=1e-5)
        np.testing.assert_allclose(best_m, best_0, rtol=1e-5)

    def test_planner_optimizes(self):
        """A few iterations of the planner must reduce the (mean height)
        objective below the zero-action baseline."""
        sim = liquid_agent_scene(n_particles=256, horizon=3)
        mesh = make_rollout_mesh(8)
        planner = MultiStartPlanner(
            sim, horizon_action=3, action_range=(-0.05, 0.05),
            n_rollouts=8, noise_scale=2e-2, lr=2e-2, mesh=mesh, seed=0,
        )
        _, _, history = planner.solve(n_iters=5)
        assert np.isfinite(history).all()
        assert history[-1] <= history[0] + 1e-6

    def test_best_selection_picks_min(self):
        sim = liquid_agent_scene(n_particles=128, horizon=2)
        planner = MultiStartPlanner(
            sim, horizon_action=2, action_range=(-0.05, 0.05),
            n_rollouts=4, noise_scale=5e-2, lr=1e-2, seed=3,
        )
        v = np.zeros((2, 3), np.float32)
        p = np.full((3,), 0.5, np.float32)
        opt = planner.init_opt_state()
        _, _, _, best, losses = planner.step(v, p, opt)
        assert best == pytest.approx(float(np.min(np.asarray(losses))), rel=1e-6)
