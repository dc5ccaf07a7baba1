"""Native software renderer tests (C++ FlexRenderer replacement)."""

import numpy as np
import pytest

from fluidlab_tpu.config import materials as M
from fluidlab_tpu.engine.sim import FluidSim


@pytest.fixture(scope="module")
def scene():
    sim = FluidSim(particle_density=3e4, horizon=4)
    sim.add_body(
        type="cube", lower=(0.3, 0.4, 0.3), upper=(0.7, 0.6, 0.7),
        material=M.WATER,
    )
    sim.add_static(
        file="cup.obj", pos=(0.63, 0.42, 0.5), scale=(1.2, 1.2, 1.2),
        material=M.CUP, has_dynamics=False,
    )
    sim.build()
    return sim


class TestNativeRenderer:
    def test_build_and_render(self, scene):
        from fluidlab_tpu.render.native_renderer import NativeRenderer

        r = NativeRenderer(res=(128, 128), camera_pos=(1.6, 1.3, 1.6),
                           camera_lookat=(0.5, 0.45, 0.5), fov=35)
        r.build(scene)
        img = r.render_frame(scene)
        assert img.shape == (128, 128, 3)
        assert img.dtype == np.uint8
        # scene content: image must not be flat background
        assert img.std() > 10

    def test_render_deterministic(self, scene):
        from fluidlab_tpu.render.native_renderer import NativeRenderer

        r = NativeRenderer(res=(96, 96))
        r.build(scene)
        a = r.render_frame(scene)
        b = r.render_frame(scene)
        np.testing.assert_array_equal(a, b)

    def test_smoothing_and_anisotropy(self, scene):
        from fluidlab_tpu.render.native_renderer import load_lib

        lib = load_lib()
        lib.swr_init(64, 64)
        lib.swr_create_scene(0.05, 1)
        n = 100
        rng = np.random.default_rng(0)
        x = rng.uniform(0.4, 0.6, (n, 3)).astype(np.float32)
        colors = np.tile(np.array([0.3, 0.8, 1.0, 1.0], np.float32), (n, 1))
        radii = np.full(n, 0.01, np.float32)
        used = np.ones(n, np.uint8)
        lib.swr_set_particles_state(
            np.ascontiguousarray(x), np.ascontiguousarray(colors),
            radii, used, n,
        )
        smoothed = np.empty_like(x)
        lib.swr_smooth_particles(0.05, 0.5, smoothed)
        assert np.isfinite(smoothed).all()
        # smoothing contracts toward local means: variance decreases
        assert smoothed.var(axis=0).sum() < x.var(axis=0).sum()

        aniso = np.empty((n, 3), np.float32)
        lib.swr_compute_anisotropy(0.06, 1.0, aniso)
        assert np.isfinite(aniso).all()
        assert (aniso > 0).all()
        # radii sorted descending per particle
        assert (aniso[:, 0] >= aniso[:, 2] - 1e-6).all()


class TestEffectorMeshPass:
    """Rigid-effector meshes drawn at the live pose (reference renders
    the agent mesh via agents/agent.py render role)."""

    @pytest.fixture(scope="class")
    def agent_scene(self):
        sim = FluidSim(particle_density=2e4, horizon=4)
        sim.setup_agent(dict(
            type="AgentRigid",
            effectors=[dict(
                type="Rigid",
                params=dict(init_pos=(0.5, 0.5, 0.5), action_dim=6),
                mesh=dict(file="glass.obj", scale=(0.5, 0.5, 0.5),
                          material="BOTTLE"),
                boundary=dict(type="cube"),
            )],
        ))
        sim.add_body(
            type="cube", lower=(0.3, 0.7, 0.3), upper=(0.5, 0.8, 0.5),
            material=M.WATER,
        )
        sim.build()
        return sim

    def test_effector_visual_recorded(self, agent_scene):
        assert len(agent_scene.effector_visuals) == 1
        assert agent_scene.effector_visuals[0]["index"] == 0

    def test_mesh_follows_pose(self, agent_scene):
        import jax.numpy as jnp

        from fluidlab_tpu.render.native_renderer import NativeRenderer

        sim = agent_scene
        r = NativeRenderer(res=(128, 128), camera_pos=(0.5, 0.6, 2.2),
                           camera_lookat=(0.5, 0.5, 0.5), fov=35)
        r.build(sim)
        assert len(r._eff_meshes) == 1
        e0 = sim.state.effectors[0]
        a = r.render_frame(sim)
        sim.state = sim.state.replace(effectors=(
            e0.replace(pos=jnp.asarray([0.2, 0.3, 0.5], jnp.float32)),
        ))
        b = r.render_frame(sim)
        sim.state = sim.state.replace(effectors=(e0,))
        c = r.render_frame(sim)
        assert (a != b).any(), "moving the effector must move its mesh"
        np.testing.assert_array_equal(a, c)

    def test_point_renderer_draws_meshes(self, agent_scene):
        import jax.numpy as jnp

        from fluidlab_tpu.render.pointcloud import PointRenderer

        sim = agent_scene
        r = PointRenderer(res=(96, 96), camera_pos=(0.5, 0.6, 2.2),
                          camera_lookat=(0.5, 0.5, 0.5), fov=35)
        r.build(sim)
        assert len(r._eff_pts) == 1
        e0 = sim.state.effectors[0]
        a = r.render_frame(sim)
        sim.state = sim.state.replace(effectors=(
            e0.replace(pos=jnp.asarray([0.2, 0.3, 0.5], jnp.float32)),
        ))
        b = r.render_frame(sim)
        sim.state = sim.state.replace(effectors=(e0,))
        assert (a != b).any()


class TestInteractiveViewer:
    """Viewer parity piece (reference GGUIRenderer camera controls):
    headless guard + pure orbit math."""

    def test_headless_raises(self, monkeypatch):
        from fluidlab_tpu.render.viewer import InteractiveViewer

        monkeypatch.delenv("DISPLAY", raising=False)
        monkeypatch.delenv("WAYLAND_DISPLAY", raising=False)
        with pytest.raises(RuntimeError, match="headless"):
            InteractiveViewer(renderer=None, sim=None)

    def test_orbit_math(self):
        import numpy as np

        from fluidlab_tpu.render.viewer import orbit_camera

        pos, lookat = (1.5, 0.5, 0.5), (0.5, 0.5, 0.5)
        # full-circle azimuth returns to start, radius preserved
        p, l = np.asarray(pos), np.asarray(lookat)
        for _ in range(8):
            p, l = orbit_camera(p, l, d_az=np.pi / 4)
        np.testing.assert_allclose(p, pos, atol=1e-5)
        np.testing.assert_allclose(l, lookat, atol=1e-6)
        # dolly changes distance only
        p2, l2 = orbit_camera(pos, lookat, d_r=0.25)
        np.testing.assert_allclose(l2, lookat, atol=1e-6)
        np.testing.assert_allclose(np.linalg.norm(p2 - l2), 1.25, rtol=1e-5)
        # elevation clamps near the pole
        p3, _ = orbit_camera(pos, lookat, d_el=10.0)
        assert np.linalg.norm(p3 - l) > 0.05


class TestDiffusePass:
    """Diffuse/spray sprites (reference shadersGL.cpp RenderDiffuse role,
    derived natively from speed + thin neighborhoods)."""

    def _setup(self, lib, n=60, speed=3.0, spread=(0.3, 0.7)):
        rng = np.random.default_rng(1)
        x = rng.uniform(*spread, (n, 3)).astype(np.float32)
        x[:, 1] = rng.uniform(0.4, 0.6, n)
        colors = np.tile(np.array([0.3, 0.6, 1.0, 1.0], np.float32), (n, 1))
        radii = np.full(n, 0.01, np.float32)
        used = np.ones(n, np.uint8)
        lib.swr_set_particles_state(
            np.ascontiguousarray(x), np.ascontiguousarray(colors),
            radii, used, n,
        )
        v = np.zeros((n, 3), np.float32)
        v[:, 1] = speed
        lib.swr_set_particles_velocity(np.ascontiguousarray(v), n)

    def test_sprite_generation_gated_by_speed_and_density(self):
        from fluidlab_tpu.render.native_renderer import load_lib

        lib = load_lib()
        lib.swr_init(64, 64)
        lib.swr_create_scene(0.05, 1)
        # fast + sparse: spray
        self._setup(lib, speed=3.0)
        n_fast = lib.swr_compute_diffuse(0.03, 1.0, 14, 2)
        assert n_fast > 0
        # slow: no spray
        self._setup(lib, speed=0.1)
        assert lib.swr_compute_diffuse(0.03, 1.0, 14, 2) == 0
        # fast but dense interior: far fewer sprites
        self._setup(lib, speed=3.0, spread=(0.48, 0.52))
        n_dense = lib.swr_compute_diffuse(0.03, 1.0, 14, 2)
        assert n_dense < n_fast
        lib.swr_clean()

    def test_sprites_change_the_image(self):
        from fluidlab_tpu.render.native_renderer import load_lib

        lib = load_lib()
        lib.swr_init(96, 96)
        lib.swr_create_scene(0.05, 1)
        cam = (np.array([1.5, 1.2, 1.5], np.float32),
               np.array([0.5, 0.5, 0.5], np.float32))
        lib.swr_set_camera_params(cam[0], cam[1], 35.0)
        self._setup(lib, speed=3.0)
        base = np.empty((96, 96, 4), np.uint8)
        lib.swr_render(base)  # no diffuse computed yet
        n = lib.swr_compute_diffuse(0.03, 1.0, 14, 3)
        assert n > 0
        img = np.empty((96, 96, 4), np.uint8)
        lib.swr_render(img)
        assert (img != base).any()
        # deterministic
        img2 = np.empty((96, 96, 4), np.uint8)
        lib.swr_render(img2)
        np.testing.assert_array_equal(img, img2)
        lib.swr_clean()
