"""Full-stack smoke tests: env registry -> record target -> solve.

Miniature LatteArt (reduced density/horizon) exercises: scene build, gym
API, demo-policy recording, target loading, jitted fwd+bwd rollout, Adam
updates, curriculum bookkeeping.
"""

import os

import numpy as np
import pytest

import fluidlab_tpu.envs as envs
from fluidlab_tpu.envs.tasks import LatteArtEnv
from fluidlab_tpu.optimizer.recorder import Recorder
from fluidlab_tpu.optimizer.solver import Solver
from fluidlab_tpu.utils.io import get_tgt_path


class TinyLatteArtEnv(LatteArtEnv):
    horizon = 10
    horizon_action = 8

    def __init__(self, target_file=None, **kwargs):
        kwargs.setdefault("particle_density", 2e4)
        self._tiny_target = target_file or get_tgt_path("TinyLatteArt-test.pkl")
        super().__init__(**kwargs)

    def setup_loss(self):
        self.target_file = self._tiny_target
        super().setup_loss()

    def build_env(self):
        super().build_env()
        self.target_file = self._tiny_target

    def setup_renderer(self):
        self.sim.renderer = None  # headless


@pytest.fixture(scope="module")
def recorded_env(tmp_path_factory):
    env = TinyLatteArtEnv(loss=False, seed=0)
    env.target_file = str(
        tmp_path_factory.mktemp("targets") / "TinyLatteArt.pkl"
    )
    Recorder(env).record()
    return env


class TestRegistry:
    def test_available(self):
        names = envs.available_envs()
        for n in [
            "LatteArt-v0", "LatteArtStir-v0", "Pouring-v0", "GatheringEasy-v0",
            "GatheringO-v0", "IceCreamDynamic-v0", "IceCreamStatic-v0",
            "Transporting-v0", "Mixing-v0", "Circulation-v0",
        ]:
            assert n in names


class TestRecordAndSolve:
    def test_record_creates_target(self, recorded_env):
        import os
        import pickle as pkl

        assert os.path.exists(recorded_env.target_file)
        with open(recorded_env.target_file, "rb") as f:
            target = pkl.load(f)
        assert len(target["x"]) == recorded_env.horizon
        assert target["x"][0].shape == (3, recorded_env.sim.cfg.n_particles)
        # demo policy injected milk: used count grows over the recording
        assert target["used"][-1].sum() > target["used"][0].sum()

    def test_solver_reduces_loss(self, recorded_env):
        env = TinyLatteArtEnv(
            loss=True, seed=0, target_file=recorded_env.target_file
        )

        cfg = dict(
            n_iters=3,
            init_range=dict(
                v=((0.0, 0.0, 0.0), (0.0, 0.0, 0.0)),
                p=((0.15, 0.65, 0.5), (0.15, 0.65, 0.5)),
            ),
            optim=dict(type="Adam", lr=1e-2, beta_1=0.9, beta_2=0.99),
        )
        solver = Solver(env, logger=None, cfg=cfg)
        policy = env.trainable_policy(cfg["optim"], cfg["init_range"])
        fwd_bwd = solver._build_fwd_bwd(policy)

        import jax.numpy as jnp

        losses = []
        for it in range(3):
            mask = env.sim.loss.temporal_mask()
            tot, step_out, final_p, (g_v, g_p) = fwd_bwd(
                jnp.asarray(policy.actions_v, jnp.float32),
                jnp.asarray(policy.actions_p, jnp.float32),
                mask,
            )
            losses.append(float(tot))
            grad = np.concatenate(
                [np.asarray(g_v, np.float64), np.asarray(g_p, np.float64)[None]]
            )
            assert np.all(np.isfinite(grad))
            info = env.sim.loss.get_final_loss_info(
                np.asarray(step_out["step_loss"], np.float64)
            )
            policy.optimize(grad, info)

        assert np.isfinite(losses).all()
        # gradient must be nonzero (actions influence the loss)
        assert np.abs(grad).max() > 0

    def test_chained_solve_matches_uninterrupted(self, recorded_env):
        """Full resume state (Adam moments + curriculum + iteration
        counter): a solve split into two segments via Solver.snapshot /
        cfg['resume'] must reproduce the uninterrupted loss course —
        the contract the cross-session solve chain (tools/
        tpu_latteart_chain.py) relies on."""

        class CourseLogger:
            def __init__(self):
                self.losses = []

            def save_policy(self, policy, iteration):
                pass

            def log(self, iteration, info):
                self.losses.append(info["loss"])

        def make_env():
            return TinyLatteArtEnv(
                loss=True, seed=0, target_file=recorded_env.target_file
            )

        base_cfg = dict(
            init_range=dict(
                v=((0.0, 0.0, 0.0), (0.0, 0.0, 0.0)),
                p=((0.15, 0.65, 0.5), (0.15, 0.65, 0.5)),
            ),
            optim=dict(type="Adam", lr=1e-2, beta_1=0.9, beta_2=0.99),
        )

        log_a = CourseLogger()
        Solver(make_env(), logger=log_a, cfg=dict(base_cfg, n_iters=4)).solve()

        log_b = CourseLogger()
        s1 = Solver(make_env(), logger=log_b, cfg=dict(base_cfg, n_iters=2))
        s1.solve()
        snap = s1.snapshot()
        assert snap["iteration"] == 2
        s2 = Solver(
            make_env(), logger=log_b,
            cfg=dict(base_cfg, n_iters=2, resume=snap),
        )
        s2.solve()

        assert len(log_a.losses) == 4 and len(log_b.losses) == 4
        np.testing.assert_allclose(log_b.losses, log_a.losses, rtol=1e-5)

    def test_solver_render_monitor(self, recorded_env, tmp_path):
        """Periodic visual monitor during solve (reference
        optimizer/solver.py:60-71 renders every 50 iterations): with
        render_every set and a renderer installed, the solver writes a
        frame via the logger's image writer."""
        from fluidlab_tpu.utils.logger import Logger

        env = TinyLatteArtEnv(
            loss=True, seed=0, target_file=recorded_env.target_file
        )
        env.sim.setup_renderer(kind="native", res=(64, 64))
        env.sim.renderer.build(env.sim)
        exp = f"render-monitor-test-{os.getpid()}"
        logger = Logger(exp)
        cfg = dict(
            n_iters=1, render_every=1,
            init_range=dict(
                v=((0.0, 0.0, 0.0), (0.0, 0.0, 0.0)),
                p=((0.15, 0.65, 0.5), (0.15, 0.65, 0.5)),
            ),
            optim=dict(type="Adam", lr=1e-2, beta_1=0.9, beta_2=0.99),
        )
        Solver(env, logger=logger, cfg=cfg).solve()
        logger.close()
        import glob as _glob
        import shutil

        imgs = _glob.glob(os.path.join(logger.img_dir, "*.png"))
        for d in (logger.img_dir, logger.policy_dir, logger.tb_dir):
            shutil.rmtree(d, ignore_errors=True)
        assert imgs, "render monitor wrote no frame"

    def test_segmented_fwd_bwd_matches_monolithic(
        self, recorded_env, monkeypatch
    ):
        """The host-segmented backward (engine/rollout.py
        make_segmented_fwd_bwd) must reproduce the monolithic jitted
        fwd+bwd: same loss, same action gradients."""
        import jax.numpy as jnp

        env = TinyLatteArtEnv(
            loss=True, seed=0, target_file=recorded_env.target_file
        )
        cfg = dict(
            init_range=dict(
                v=((0.0, 0.0, 0.0), (0.0, 0.0, 0.0)),
                p=((0.15, 0.65, 0.5), (0.15, 0.65, 0.5)),
            ),
            optim=dict(type="Adam", lr=1e-2, beta_1=0.9, beta_2=0.99),
        )
        solver = Solver(env, logger=None, cfg=cfg)
        policy = env.trainable_policy(cfg["optim"], cfg["init_range"])
        mask = env.sim.loss.temporal_mask()
        av = jnp.asarray(policy.actions_v, jnp.float32)
        ap = jnp.asarray(policy.actions_p, jnp.float32)

        mono = solver._build_fwd_bwd(policy)
        tot_m, out_m, fin_m, (gv_m, gp_m) = mono(av, ap, mask)

        monkeypatch.setenv("FL_SEGLEN", "5")  # horizon 10 -> 2 segments
        seg = solver._build_fwd_bwd(policy)
        tot_s, out_s, fin_s, (gv_s, gp_s) = seg(av, ap, mask)

        np.testing.assert_allclose(
            float(tot_s), float(tot_m), rtol=1e-5, atol=1e-7
        )
        np.testing.assert_allclose(
            np.asarray(out_s["step_loss"]), np.asarray(out_m["step_loss"]),
            rtol=1e-5, atol=1e-7,
        )
        scale = max(np.abs(np.asarray(gv_m)).max(), 1e-12)
        np.testing.assert_allclose(
            np.asarray(gv_s), np.asarray(gv_m),
            rtol=1e-4, atol=1e-5 * scale,
        )
        np.testing.assert_allclose(
            np.asarray(gp_s), np.asarray(gp_m),
            rtol=1e-4, atol=1e-5 * max(np.abs(np.asarray(gp_m)).max(), 1e-12),
        )
        np.testing.assert_allclose(
            np.asarray(fin_s[0]), np.asarray(fin_m[0]), rtol=1e-5, atol=1e-6
        )

    def test_gym_step_api(self, recorded_env):
        env = TinyLatteArtEnv(
            loss=True, seed=0, target_file=recorded_env.target_file
        )
        obs = env.reset()
        assert obs.ndim == 1 and np.isfinite(obs).all()
        a = env.action_space.sample()
        obs, reward, done, info = env.step(a)
        assert np.isfinite(reward)
        assert not done


class TestBonusEnvs:
    """Scooping-v0 / Stabilizing-v0: beyond-reference tasks (registered
    but never shipped upstream) — build, step, reward, and a live
    action->loss gradient."""

    @pytest.mark.parametrize("name", ["Scooping-v0", "Stabilizing-v0"])
    def test_build_step_reward(self, name):
        env = envs.make(name, particle_density=2e4, loss=True)
        env.reset()
        policy = env.demo_policy()
        for t in range(2):
            obs, reward, done, info = env.step(policy.get_action_v(t))
        assert np.isfinite(reward)
        assert obs.shape == env.observation_space.shape

    def test_scooping_grad_flows(self):
        import jax
        import jax.numpy as jnp

        from fluidlab_tpu.config.materials import RIGID_LIGHT

        env = envs.make("Scooping-v0", particle_density=3e4, loss=True)
        sim = env.sim
        # sink the ladle shell into the water: the soft-contact skin is
        # ~3mm at softness 100 (mesh-unit SDF convention, reference
        # dynamic.py:93-121), so sparse test scenes need real
        # penetration for active contact (2 particles at this pose)
        sim.apply_agent_action_p(np.array([0.6, 0.42, 0.5], np.float32))
        step = sim._step_fn  # (state, params, action, has_action)

        def loss(a):
            st = sim.state
            for _ in range(2):
                st = step(st, sim.params, a, jnp.asarray(True))
            x = st.particles.x
            match = st.particles.used & (
                sim.params.p_mat == RIGID_LIGHT
            )
            lift = jnp.sum(jnp.where(match, (0.75 - x[1]) ** 2, 0.0))
            # the ladle->ball chain is weak over 2 steps; the water
            # contact term guarantees a live collision gradient
            return lift + 1e-3 * jnp.sum(jnp.abs(st.particles.v))

        g = jax.jit(jax.grad(loss))(jnp.zeros((3,), jnp.float32))
        assert np.isfinite(np.asarray(g)).all()
        assert float(jnp.sum(jnp.abs(g))) > 0
