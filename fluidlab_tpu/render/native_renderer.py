"""ctypes wrapper for the native software renderer.

Python shim with the same role as the reference GLRenderer wrapper
(reference fluidlab/fluidengine/renderers/gl_renderer.py:14-225): marshals
per-body colors, meshes, particle state and smoke into the native module
and returns RGBA frames.  Builds the shared library on first use.
"""

from __future__ import annotations

import ctypes
import os
import subprocess

import numpy as np

_NATIVE_DIR = os.path.join(os.path.dirname(os.path.abspath(__file__)), "native")
_LIB_PATH = os.path.join(_NATIVE_DIR, "libswrenderer.so")

_f32p = np.ctypeslib.ndpointer(np.float32, flags="C_CONTIGUOUS")
_i32p = np.ctypeslib.ndpointer(np.int32, flags="C_CONTIGUOUS")
_u8p = np.ctypeslib.ndpointer(np.uint8, flags="C_CONTIGUOUS")


def _build_lib():
    subprocess.run(
        ["make", "-C", _NATIVE_DIR], check=True, capture_output=True
    )


def load_lib():
    if not os.path.exists(_LIB_PATH):
        _build_lib()
    lib = ctypes.CDLL(_LIB_PATH)
    lib.swr_init.argtypes = [ctypes.c_int, ctypes.c_int]
    lib.swr_create_scene.argtypes = [ctypes.c_float, ctypes.c_int]
    lib.swr_set_camera_params.argtypes = [_f32p, _f32p, ctypes.c_float]
    lib.swr_get_camera_params.argtypes = [_f32p, _f32p, _f32p]
    lib.swr_set_light.argtypes = [_f32p]
    lib.swr_add_mesh.argtypes = [_f32p, ctypes.c_int, _i32p, ctypes.c_int, _f32p]
    lib.swr_add_mesh.restype = ctypes.c_int
    lib.swr_update_mesh.argtypes = [ctypes.c_int, _f32p, ctypes.c_int]
    lib.swr_set_particles_state.argtypes = [
        _f32p, _f32p, _f32p, _u8p, ctypes.c_int
    ]
    lib.swr_get_n_particles.restype = ctypes.c_int
    lib.swr_add_smoke_particles.argtypes = [_f32p, _f32p, ctypes.c_int]
    lib.swr_update_smoke_particles.argtypes = [_f32p, ctypes.c_int]
    lib.swr_smooth_particles.argtypes = [ctypes.c_float, ctypes.c_float, _f32p]
    lib.swr_compute_anisotropy.argtypes = [ctypes.c_float, ctypes.c_float, _f32p]
    lib.swr_set_particles_velocity.argtypes = [_f32p, ctypes.c_int]
    lib.swr_set_diffuse_params.argtypes = [
        _f32p, ctypes.c_float, ctypes.c_float
    ]
    lib.swr_compute_diffuse.argtypes = [
        ctypes.c_float, ctypes.c_float, ctypes.c_int, ctypes.c_int
    ]
    lib.swr_compute_diffuse.restype = ctypes.c_int
    lib.swr_render.argtypes = [_u8p]
    return lib


class NativeRenderer:
    """Headless fluid renderer with surface smoothing + anisotropy.

    API-parallel to the reference GLRenderer: build(sim), then
    render_frame(sim, mode) -> RGBA array.
    """

    def __init__(
        self,
        res=(512, 512),
        camera_pos=(1.5, 1.5, 1.5),
        camera_lookat=(0.5, 0.5, 0.5),
        fov=30,
        light_dir=(-0.4, -0.8, -0.45),
        particle_radius=0.008,
        smoothing=0.5,
        anisotropy=True,
        diffuse=True,
        diffuse_speed=1.0,
        floor_height=0.05,
        **_unused,
    ):
        self.res = tuple(res)
        self.camera_pos = np.asarray(camera_pos, np.float32)
        self.camera_lookat = np.asarray(camera_lookat, np.float32)
        self.fov = float(fov)
        self.light_dir = np.asarray(light_dir, np.float32)
        self.particle_radius = float(particle_radius)
        self.smoothing = float(smoothing)
        self.anisotropy = bool(anisotropy)
        self.diffuse = bool(diffuse)
        self.diffuse_speed = float(diffuse_speed)
        self.floor_height = float(floor_height)
        self.lib = load_lib()
        self._built = False

    def build(self, sim):
        self.sim = sim
        W, H = self.res
        self.lib.swr_init(W, H)
        self.lib.swr_create_scene(self.floor_height, 1)
        self.lib.swr_set_camera_params(
            np.ascontiguousarray(self.camera_pos),
            np.ascontiguousarray(self.camera_lookat),
            self.fov,
        )
        self.lib.swr_set_light(np.ascontiguousarray(self.light_dir))

        self._colors = None
        if sim.particles is not None:
            self._colors = np.ascontiguousarray(
                sim.particles["color"].astype(np.float32)
            )
        # static meshes (visual): registered once
        self._mesh_ids = []
        for s in getattr(sim, "statics", []):
            try:
                from fluidlab_tpu.config import materials as M
                from fluidlab_tpu.engine import meshio

                verts, faces = meshio.load_raw_mesh(s.file_vis)
                verts = meshio.normalize_mesh(verts)
                verts = verts @ s.T_init[:3, :3].T + s.T_init[:3, 3]
                rgba = np.asarray(
                    M.COLOR.get(s.material, (0.8, 0.8, 0.8, 1.0)), np.float32
                )
                mid = self.lib.swr_add_mesh(
                    np.ascontiguousarray(verts.astype(np.float32)),
                    len(verts),
                    np.ascontiguousarray(faces.astype(np.int32)),
                    len(faces),
                    np.ascontiguousarray(rgba),
                )
                self._mesh_ids.append(mid)
            except FileNotFoundError:
                pass
        # rigid-effector meshes (agent visuals): registered once in the
        # effector's local frame (T_init @ normalized verts), re-posed
        # every frame from state.effectors[i].{pos, quat} — the
        # reference draws the agent via its mesh at the live pose
        # (agents/agent.py render role)
        self._eff_meshes = []
        for ev in getattr(sim, "effector_visuals", []):
            try:
                from fluidlab_tpu.config import materials as M
                from fluidlab_tpu.engine import meshio

                verts, faces = meshio.load_raw_mesh(ev["file"])
                verts = meshio.normalize_mesh(verts)
                T = np.asarray(ev["T_init"], np.float64)
                base = (verts @ T[:3, :3].T + T[:3, 3]).astype(np.float32)
                rgba = np.asarray(
                    M.COLOR.get(ev["material"], (0.8, 0.8, 0.8, 1.0)),
                    np.float32,
                )
                mid = self.lib.swr_add_mesh(
                    np.ascontiguousarray(base), len(base),
                    np.ascontiguousarray(faces.astype(np.int32)), len(faces),
                    np.ascontiguousarray(rgba),
                )
                self._eff_meshes.append((ev["index"], mid, base))
            except FileNotFoundError:
                pass
        self._built = True

    def set_camera(self, pos=None, lookat=None, fov=None):
        """Update the camera between frames (interactive orbit — the
        reference GGUIRenderer's camera controls, ggui_renderer.py:83-129)."""
        if pos is not None:
            self.camera_pos = np.asarray(pos, np.float32)
        if lookat is not None:
            self.camera_lookat = np.asarray(lookat, np.float32)
        if fov is not None:
            self.fov = float(fov)
        if self._built:
            self.lib.swr_set_camera_params(
                np.ascontiguousarray(self.camera_pos),
                np.ascontiguousarray(self.camera_lookat),
                self.fov,
            )

    def render_frame(self, sim, mode="rgb_array", tgt_particles=None):
        W, H = self.res
        from fluidlab_tpu.core.quat import quat_to_R_np

        for idx, mid, base in getattr(self, "_eff_meshes", ()):
            eff = sim.state.effectors[idx]
            R = quat_to_R_np(np.asarray(eff.quat, np.float64))
            pos = np.asarray(eff.pos, np.float64)
            world = (base.astype(np.float64) @ R.T + pos).astype(np.float32)
            self.lib.swr_update_mesh(
                mid, np.ascontiguousarray(world), len(world)
            )
        if sim.state.particles is not None:
            x = np.ascontiguousarray(
                np.asarray(sim.state.particles.x, np.float32).T
            )
            used = np.ascontiguousarray(
                np.asarray(sim.state.particles.used).astype(np.uint8)
            )
            n = len(x)
            colors = (
                self._colors
                if self._colors is not None
                else np.tile(
                    np.array([0.4, 0.7, 1.0, 1.0], np.float32), (n, 1)
                )
            )
            radii = np.full(n, self.particle_radius, np.float32)
            self.lib.swr_set_particles_state(x, colors, radii, used, n)
            if self.diffuse:
                # diffuse/spray pass (reference shadersGL.cpp
                # RenderDiffuse role): derive sprites from speed + thin
                # neighborhoods, composited after the fluid surface
                vel = np.ascontiguousarray(
                    np.asarray(sim.state.particles.v, np.float32).T
                )
                self.lib.swr_set_particles_velocity(vel, n)
                self.lib.swr_compute_diffuse(
                    3.0 * self.particle_radius,
                    self.diffuse_speed, 14, 2,
                )
            if self.smoothing > 0:
                smoothed = np.empty_like(x)
                self.lib.swr_smooth_particles(
                    2.5 * self.particle_radius, self.smoothing, smoothed
                )
                self.lib.swr_set_particles_state(
                    np.ascontiguousarray(smoothed), colors, radii, used, n
                )
            if self.anisotropy:
                out = np.empty((n, 3), np.float32)
                # scale 1.5 closes inter-particle gaps at typical scene
                # densities (the NvFlex default anisotropy scale is ~1)
                self.lib.swr_compute_anisotropy(
                    3.0 * self.particle_radius, 1.5, out
                )
        if sim.state.smoke is not None:
            # visualize the hot slab as translucent points (reference
            # smoke colorize, smoke_field.py:291-299)
            q = np.asarray(sim.state.smoke.q)[0]
            R = q.shape[0]
            stride = max(1, R // 32)
            sub = q[::stride, ::stride, ::stride]
            idx = np.argwhere(sub > 0.05)
            pos = ((idx * stride + 0.5) / R).astype(np.float32)
            hot = np.array([1.0, 0.45, 0.14, 0.8], np.float32)
            cold = np.array([0.0, 0.55, 1.0, 0.8], np.float32)
            qv = sub[idx[:, 0], idx[:, 1], idx[:, 2]][:, None]
            colors = (cold * (1 - qv) + hot * qv).astype(np.float32)
            self.lib.swr_add_smoke_particles(
                np.ascontiguousarray(pos), np.ascontiguousarray(colors), len(pos)
            )

        out = np.empty((H, W, 4), np.uint8)
        self.lib.swr_render(out)
        return out[..., :3]
