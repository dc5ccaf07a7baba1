"""Scene construction + facade integration tests (FluidSim ~ TaichiEnv)."""

import jax.numpy as jnp
import numpy as np
import pytest

from fluidlab_tpu.config import materials as M
from fluidlab_tpu.engine.sim import FluidSim


def build_latteart_like(density=2e4, horizon=6):
    """Miniature LatteArt scene (reference latteart_env.py:12-111):
    nowhere milk pool + coffee cylinder, injector agent, cylinder
    boundary, cup static (visual-only, has_dynamics=False)."""
    sim = FluidSim(
        particle_density=density,
        max_substeps_local=50,
        gravity=(0.0, -20.0, 0.0),
        horizon=horizon,
    )
    sim.setup_agent(
        dict(
            type="AgentInjector",
            effectors=[
                dict(
                    type="Injector",
                    params=dict(
                        radius=0.0075,
                        flux=2,
                        init_pos=(0.5, 0.5, 0.5),
                        action_dim=3,
                        inject_v=(0.0, -3.0, 0.0),
                        locally_random=True,
                    ),
                    boundary=dict(
                        type="cylinder",
                        xz_radius=0.42,
                        xz_center=(0.5, 0.5),
                        y_range=(0.65, 0.65),
                    ),
                )
            ],
        )
    )
    sim.add_body(type="nowhere", n_particles=100, material=M.MILK)
    sim.add_body(
        type="cylinder",
        center=(0.5, 0.55, 0.5),
        height=0.1,
        radius=0.42,
        material=M.COFFEE,
    )
    sim.setup_boundary(
        type="cylinder", xz_radius=0.42, xz_center=(0.5, 0.5), y_range=(0.5, 0.95)
    )
    sim.build()
    return sim


class TestLatteArtLike:
    @pytest.fixture(scope="class")
    def sim(self):
        return build_latteart_like()

    def test_build_shapes(self, sim):
        assert sim.cfg.n_particles == sim.init_state.particles.x.shape[-1]
        assert sim.cfg.n_bodies == 2
        assert sim.action_dim == 3
        # milk pool initially unused
        used = np.asarray(sim.init_state.particles.used)
        mat = np.asarray(sim.params.p_mat)
        assert not used[mat == M.MILK].any()
        assert used[mat == M.COFFEE].all()

    def test_injection_activates_particles(self, sim):
        sim.reset()
        used0 = int(np.asarray(sim.state.particles.used).sum())
        sim.step(np.zeros(3, np.float32))
        sim.step(np.zeros(3, np.float32))
        used1 = int(np.asarray(sim.state.particles.used).sum())
        # flux=2 per substep, 10 substeps per step, 2 steps = 40 particles
        assert used1 - used0 == 40
        # injected particles near the injector
        x = np.asarray(sim.state.particles.x).T  # (N, 3)
        used = np.asarray(sim.state.particles.used)
        mat = np.asarray(sim.params.p_mat)
        milk_used = used & (mat == M.MILK)
        assert milk_used.sum() == 40
        d = np.linalg.norm(x[milk_used] - np.array([0.5, 0.65, 0.5]), axis=1)
        assert d.max() < 0.2  # fell a little, still near the spout

    def test_no_action_freezes_injection(self, sim):
        sim.reset()
        sim.step(None)
        used = np.asarray(sim.state.particles.used)
        mat = np.asarray(sim.params.p_mat)
        assert (used & (mat == M.MILK)).sum() == 0

    def test_apply_action_p_moves_effector(self, sim):
        sim.reset()
        sim.apply_agent_action_p(np.array([0.15, 0.65, 0.5], np.float32))
        pos = np.asarray(sim.state.effectors[0].pos)
        # cylinder boundary clamps y to 0.65 band and radius 0.42
        np.testing.assert_allclose(pos[1], 0.65, atol=1e-6)
        assert np.linalg.norm(pos[[0, 2]] - 0.5) <= 0.42 + 1e-5

    def test_coffee_stays_in_cylinder(self, sim):
        sim.reset()
        for _ in range(4):
            sim.step(np.zeros(3, np.float32))
        x = np.asarray(sim.state.particles.x).T
        used = np.asarray(sim.state.particles.used)
        r = np.linalg.norm(x[used][:, [0, 2]] - 0.5, axis=1)
        # grid-node velocity clamping lets particles settle up to ~1 cell
        # past the wall (same as the reference: impose_x_v only projects
        # node velocities, boundaries.py:40-63)
        dx = 1.0 / 64
        assert r.max() <= 0.42 + 2 * dx
        assert x[used][:, 1].min() >= 0.5 - 2 * dx


class TestRigidAgent:
    def test_stirrer_collides(self):
        """A rigid effector moving through liquid must drag particles
        (dynamic SDF collision, reference dynamic.py:93-121)."""
        sim = FluidSim(particle_density=3e4, horizon=8, gravity=(0.0, 0.0, 0.0))
        sim.setup_agent(
            dict(
                type="AgentRigid",
                effectors=[
                    dict(
                        type="Rigid",
                        params=dict(
                            init_pos=(0.3, 0.5, 0.5),
                            action_dim=3,
                            action_scale_v=(1.0, 1.0, 1.0),
                        ),
                        mesh=dict(
                            file="stirrer.obj",
                            material="STIRRER",
                            softness=100.0,
                            scale=(0.45, 0.45, 0.45),
                        ),
                        boundary=dict(type="cube"),
                    )
                ],
            )
        )
        sim.add_body(
            type="cube", lower=(0.35, 0.4, 0.4), upper=(0.6, 0.6, 0.6),
            material=M.WATER,
        )
        sim.build()
        x0 = np.asarray(sim.state.particles.x).T.copy()
        vx0 = float(np.abs(np.asarray(sim.state.particles.v)).max())
        for _ in range(6):
            sim.step(np.array([0.05, 0.0, 0.0], np.float32))
        v1 = np.asarray(sim.state.particles.v)
        # effector moved through/near the block; some particles must have
        # picked up velocity (zero gravity: only source is the collider)
        assert np.abs(v1).max() > 1e-4
        assert float(np.asarray(sim.state.effectors[0].pos)[0]) > 0.3 + 0.2


class TestCollector:
    def test_pouring_collector_removes_particles(self):
        sim = FluidSim(particle_density=2e4, horizon=4)
        sim.setup_agent(
            dict(
                type="AgentPouring",
                params=dict(
                    collector_boundary=dict(
                        type="cube", lower=(0.0, 0.4, 0.0), upper=(1.0, 1.0, 1.0)
                    )
                ),
                effectors=[
                    dict(
                        type="Rigid",
                        params=dict(init_pos=(0.5, 0.8, 0.5), action_dim=6,
                                    action_scale_v=(1.0,) * 6),
                        mesh=dict(file="glass.obj", material="BOTTLE",
                                  scale=(0.75, 0.65, 0.75)),
                        boundary=dict(type="cube"),
                    )
                ],
            )
        )
        # block straddling the collector's lower y boundary: the part
        # below y=0.4 is immediately out-of-boundary and gets collected
        sim.add_body(
            type="cube", lower=(0.4, 0.35, 0.4), upper=(0.6, 0.55, 0.6),
            material=M.WATER,
        )
        sim.build()
        used0 = int(np.asarray(sim.state.particles.used).sum())
        below0 = int(
            (np.asarray(sim.state.particles.x)[1] < 0.4).sum()
        )
        assert below0 > 0
        for _ in range(2):
            sim.step(np.zeros(6, np.float32))
        used1 = int(np.asarray(sim.state.particles.used).sum())
        assert used1 <= used0 - below0  # the below-boundary part collected
        x = np.asarray(sim.state.particles.x).T
        gone = ~np.asarray(sim.state.particles.used)
        assert np.allclose(x[gone], -100.0)


class TestReproducibility:
    def test_same_seed_same_rollout(self):
        """Scene construction pins seed 0 (reference bodies.py:27-29) and
        the engine is deterministic: two identical builds produce
        bit-identical trajectories (multi-host determinism prerequisite,
        SURVEY.md §2.13.5)."""
        import jax.numpy as jnp

        def build_and_run():
            sim = FluidSim(particle_density=2e4, horizon=4)
            sim.add_body(
                type="cube", lower=(0.3, 0.2, 0.3), upper=(0.6, 0.5, 0.6),
                material=M.WATER,
            )
            sim.build()
            for _ in range(3):
                sim.step(None)
            return np.asarray(sim.state.particles.x)  # (3, N)

        x1 = build_and_run()
        x2 = build_and_run()
        np.testing.assert_array_equal(x1, x2)
