"""Lightweight software point renderer (numpy).

Stand-in for the reference GGUI viewer (reference renderers/
ggui_renderer.py): perspective-projects particles and z-buffers them as
splats to an RGB array.  Good enough for headless parity artifacts and
`rgb_array` gym rendering; the C++ EGL fluid renderer (FlexRenderer
replacement, SURVEY.md §2.12) is a separate component.
"""

from __future__ import annotations

import numpy as np

from fluidlab_tpu.core.quat import compute_camera_angle_np


class PointRenderer:
    def __init__(
        self,
        res=(512, 512),
        camera_pos=(1.5, 1.5, 1.5),
        camera_lookat=(0.5, 0.5, 0.5),
        fov=30,
        particle_radius=2,
        background=(0.12, 0.12, 0.14),
        lights=None,
        **_unused,
    ):
        self.res = tuple(res)
        self.camera_pos = np.asarray(camera_pos, np.float64)
        self.camera_lookat = np.asarray(camera_lookat, np.float64)
        self.fov = float(fov)
        self.radius = int(particle_radius)
        self.background = np.asarray(background, np.float32)

    def build(self, sim):
        self.sim = sim
        self.colors = None
        if sim.particles is not None:
            self.colors = sim.particles["color"][:, :3].astype(np.float32)
        # scene meshes as point sets (reference GGUI draws static and
        # agent meshes, ggui_renderer.py scene.mesh role): statics are
        # fixed in world space; rigid-effector meshes are re-posed per
        # frame from state.effectors[i].{pos, quat}
        from fluidlab_tpu.config import materials as M
        from fluidlab_tpu.engine import meshio

        def _mesh_points(file, T, material, cap=2000):
            verts, _ = meshio.load_raw_mesh(file)
            verts = meshio.normalize_mesh(verts)
            pts = verts @ T[:3, :3].T + T[:3, 3]
            if len(pts) > cap:
                pts = pts[:: len(pts) // cap + 1]
            rgb = np.asarray(
                M.COLOR.get(material, (0.7, 0.7, 0.7, 1.0)), np.float32
            )[:3]
            return pts.astype(np.float64), np.tile(rgb, (len(pts), 1))

        self._static_pts = []
        for s in getattr(sim, "statics", []):
            try:
                self._static_pts.append(
                    _mesh_points(s.file_vis, np.asarray(s.T_init), s.material)
                )
            except FileNotFoundError:
                pass
        self._eff_pts = []
        for ev in getattr(sim, "effector_visuals", []):
            try:
                pts, rgb = _mesh_points(
                    ev["file"], np.asarray(ev["T_init"]), ev["material"]
                )
                self._eff_pts.append((ev["index"], pts, rgb))
            except FileNotFoundError:
                pass

    def set_camera(self, pos=None, lookat=None, fov=None):
        """Update the camera between frames (InteractiveViewer orbit —
        mirrors NativeRenderer.set_camera)."""
        if pos is not None:
            self.camera_pos = np.asarray(pos, np.float64)
        if lookat is not None:
            self.camera_lookat = np.asarray(lookat, np.float64)
        if fov is not None:
            self.fov = float(fov)

    def _view_matrix(self):
        fwd = self.camera_lookat - self.camera_pos
        fwd = fwd / np.linalg.norm(fwd)
        up = np.array([0.0, 1.0, 0.0])
        right = np.cross(fwd, up)
        right /= np.linalg.norm(right) + 1e-12
        up2 = np.cross(right, fwd)
        return np.stack([right, up2, -fwd]), self.camera_pos

    def render_frame(self, sim, mode="rgb_array", tgt_particles=None):
        W, H = self.res
        img = np.tile(self.background, (H, W, 1)).copy()
        zbuf = np.full((H, W), np.inf)

        clouds = []
        if sim.state.particles is not None:
            x = np.asarray(sim.state.particles.x).T  # (N, 3)
            used = np.asarray(sim.state.particles.used)
            # colors only apply when the state matches the built scene's
            # particle set (a replayed target recorded at a different
            # density has its own N -> neutral color)
            pcolors = (
                self.colors[used]
                if self.colors is not None and len(self.colors) == len(used)
                else np.full((int(used.sum()), 3), 0.6, np.float32)
            )
            clouds.append((x[used], pcolors))
        clouds.extend(getattr(self, "_static_pts", []))
        from fluidlab_tpu.core.quat import quat_to_R_np

        for idx, base, rgb in getattr(self, "_eff_pts", ()):
            eff = sim.state.effectors[idx]
            Rm = quat_to_R_np(np.asarray(eff.quat, np.float64))
            clouds.append((base @ Rm.T + np.asarray(eff.pos, np.float64), rgb))

        if sim.state.smoke is not None:
            # hot-slab visualization (mirrors the native renderer's
            # smoke branch; reference smoke colorize role,
            # smoke_field.py:291-299)
            q = np.asarray(sim.state.smoke.q)[0]
            Rg = q.shape[0]
            stride = max(1, Rg // 32)
            sub = q[::stride, ::stride, ::stride]
            idx = np.argwhere(sub > 0.05)
            if len(idx):
                pos = ((idx * stride + 0.5) / Rg).astype(np.float64)
                hot = np.array([1.0, 0.45, 0.14], np.float32)
                cold = np.array([0.0, 0.55, 1.0], np.float32)
                qv = sub[idx[:, 0], idx[:, 1], idx[:, 2]][:, None]
                clouds.append((pos, (cold * (1 - qv) + hot * qv)))

        if clouds:
            xall = np.concatenate([c[0] for c in clouds])
            colors = np.concatenate(
                [np.asarray(c[1], np.float32) for c in clouds]
            )
            R, cam = self._view_matrix()
            pts = (xall - cam) @ R.T
            z = -pts[:, 2]
            valid = z > 1e-3
            pts, colors, z = pts[valid], colors[valid], z[valid]
            f = 0.5 * H / np.tan(np.deg2rad(self.fov) / 2)
            u = (pts[:, 0] / z * f + W / 2).astype(np.int32)
            v = (H / 2 - pts[:, 1] / z * f).astype(np.int32)
            ok = (u >= 0) & (u < W) & (v >= 0) & (v < H)
            u, v, z, colors = u[ok], v[ok], z[ok], colors[ok]
            # painter's by z-sort (far to near)
            order = np.argsort(-z)
            u, v, colors = u[order], v[order], colors[order]
            r = self.radius
            for du in range(-r, r + 1):
                for dv in range(-r, r + 1):
                    if du * du + dv * dv > r * r:
                        continue
                    uu = np.clip(u + du, 0, W - 1)
                    vv = np.clip(v + dv, 0, H - 1)
                    img[vv, uu] = colors
        frame = (np.clip(img, 0, 1) * 255).astype(np.uint8)
        return frame
