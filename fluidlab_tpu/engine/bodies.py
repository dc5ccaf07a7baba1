"""Particle body sampling: cube / cylinder / ball / mesh / nowhere.

Host-side (numpy) scene construction, feature-parity with the reference
(reference fluidlab/fluidengine/bodies/bodies.py:11-235): same fillings
(random / grid / natural), same particle-count rule (volume * density),
same pinned seed-0 sampling for bit-reproducible scenes across hosts
(reference bodies.py:27-29 — load-bearing for multi-host determinism,
SURVEY.md §2.13.5).
"""

from __future__ import annotations

import numpy as np

from fluidlab_tpu.config import materials as M
from fluidlab_tpu.core.quat import euler_to_R_np


class Bodies:
    def __init__(self, dim=3, particle_density=1e6):
        self.dim = dim
        self.particle_density = particle_density
        self.bodies = []
        self.materials = []
        self.used = []
        self.colors = []
        self.rhos = []
        self.body_ids = []

    def __len__(self):
        return len(self.bodies)

    def add_body(self, type, filling="random", **kwargs):
        # pin seed 0 for reproducible sampling (reference bodies.py:27-29)
        state = np.random.get_state()
        np.random.seed(0)
        try:
            assert filling in ("random", "grid", "natural")
            if type == "nowhere":
                self.add_nowhere(**kwargs)
            elif type == "cube":
                self.add_cube(filling=filling, **kwargs)
            elif type == "cylinder":
                self.add_cylinder(filling=filling, **kwargs)
            elif type == "ball":
                self.add_ball(filling=filling, **kwargs)
            elif type == "mesh":
                self.add_mesh(filling=filling, **kwargs)
            else:
                raise NotImplementedError(f"Unsupported body type: {type}.")
        finally:
            np.random.set_state(state)

    def compute_n_particles(self, volume):
        return round(volume * self.particle_density)

    def compute_n_particles_1d(self, length):
        return round(length * np.cbrt(self.particle_density))

    def _add_body(self, type, particles, material, color=None, used=False,
                  euler=(0.0, 0.0, 0.0)):
        body_color = np.tile(
            color if color is not None else M.COLOR[material],
            [len(particles), 1],
        )
        body_rho = np.full(len(particles), M.RHO[material])
        body_material = np.full(len(particles), material)
        body_used = np.full(len(particles), used)
        body_id = np.full(len(particles), len(self.bodies))

        # rotate about COM (reference bodies.py:79-83)
        R = euler_to_R_np(euler)
        com = particles.mean(0)
        particles = (R @ (particles - com).T).T + com

        self.colors.append(body_color)
        self.rhos.append(body_rho)
        self.materials.append(body_material)
        self.used.append(body_used)
        self.body_ids.append(body_id)
        self.bodies.append(particles)

    def sample_cube(self, lower, upper, filling):
        size = upper - lower
        if filling == "random":
            n = self.compute_n_particles(np.prod(size))
            return np.random.uniform(low=lower, high=upper, size=(n, self.dim))
        if filling == "grid":
            ns = [self.compute_n_particles_1d(size[i]) for i in range(3)]
            axes = [np.linspace(lower[i], upper[i], ns[i] + 1) for i in range(3)]
            return np.stack(
                np.meshgrid(*axes, indexing="ij"), -1
            ).reshape((-1, 3))
        raise NotImplementedError(filling)

    def add_nowhere(self, n_particles, **kwargs):
        particles = np.tile(np.array(M.NOWHERE), (n_particles, 1))
        self._add_body("nowhere", particles, used=False, **kwargs)

    def add_cube(self, lower, filling="random", upper=None, size=None, **kwargs):
        lower = np.array(lower)
        upper = lower + np.array(size) if size is not None else np.array(upper)
        assert (upper >= lower).all()
        if filling == "natural":
            filling = "grid"
        particles = self.sample_cube(lower, upper, filling)
        self._add_body("cube", particles, used=True, **kwargs)

    def add_cylinder(self, center, height, radius, filling="random", **kwargs):
        center = np.array(center)
        if filling == "natural":
            # layered packing (reference bodies.py:135-147)
            n_y = self.compute_n_particles_1d(height)
            n_r = self.compute_n_particles_1d(radius)
            parts = []
            for y in np.linspace(center[1] - height / 2, center[1] + height / 2, n_y + 1):
                for r in np.linspace(0, radius, n_r + 1):
                    n_layer = max(self.compute_n_particles_1d(2 * np.pi * r), 1)
                    rad = np.linspace(0, np.pi * 2, n_layer + 1)[:-1]
                    parts.append(
                        np.vstack([
                            np.cos(rad) * r + center[0],
                            np.repeat(y, n_layer),
                            np.sin(rad) * r + center[2],
                        ])
                    )
            particles = np.hstack(parts).T
        else:
            lo = np.array([center[0] - radius, center[1] - height / 2, center[2] - radius])
            hi = np.array([center[0] + radius, center[1] + height / 2, center[2] + radius])
            particles = self.sample_cube(lo, hi, filling)
            r = np.linalg.norm(particles[:, [0, 2]] - center[[0, 2]], axis=1)
            particles = particles[r <= radius]
        self._add_body("cylinder", particles, used=True, **kwargs)

    def add_ball(self, center, radius, filling="random", **kwargs):
        center = np.array(center)
        if filling == "natural":
            # concentric shells (reference bodies.py:160-173)
            n_r = self.compute_n_particles_1d(radius)
            parts = []
            for r_sphere in np.linspace(0, radius, n_r + 1):
                n_layers = self.compute_n_particles_1d(r_sphere * np.pi)
                for ver in np.linspace(-np.pi / 2, np.pi / 2, n_layers + 1):
                    y = center[1] + np.sin(ver) * r_sphere
                    r_layer = np.sqrt(max(r_sphere ** 2 - (center[1] - y) ** 2, 0))
                    n_p = max(self.compute_n_particles_1d(2 * np.pi * r_layer), 1)
                    hor = np.linspace(0, np.pi * 2, n_p + 1)[:-1]
                    parts.append(
                        np.vstack([
                            np.cos(hor) * r_layer + center[0],
                            np.repeat(y, n_p),
                            np.sin(hor) * r_layer + center[2],
                        ])
                    )
            particles = np.hstack(parts).T
        else:
            particles = self.sample_cube(center - radius, center + radius, filling)
            r = np.linalg.norm(particles - center, axis=1)
            particles = particles[r <= radius]
        self._add_body("ball", particles, used=True, **kwargs)

    def add_mesh(self, file, filling="random", pos=(0.5, 0.5, 0.5),
                 scale=(1.0, 1.0, 1.0), voxelize_res=128, **kwargs):
        """Fill a mesh volume with particles via voxel occupancy (reference
        bodies.py:187-210)."""
        from fluidlab_tpu.engine.meshio import load_voxels

        assert filling != "natural"
        voxels = load_voxels(file, voxelize_res)
        scale = np.array(scale)
        pos = np.array(pos)
        particles = self.sample_cube(pos - scale * 0.5, pos + scale * 0.5, filling)
        inside = voxels.is_filled((particles - pos) / scale)
        self._add_body("mesh", particles[inside], used=True, **kwargs)

    def get(self):
        """Concatenate all bodies (reference bodies.py:212-235)."""
        if len(self.bodies) == 0:
            return None
        particles = {
            "x": np.concatenate(self.bodies),
            "mat": np.concatenate(self.materials),
            "used": np.concatenate(self.used),
            "color": np.concatenate(self.colors),
            "rho": np.concatenate(self.rhos),
            "body_id": np.concatenate(self.body_ids),
            "bodies": {
                "n": len(self.bodies),
                "n_particles": [len(b) for b in self.bodies],
                "particle_ids": [
                    np.sort(np.where(np.concatenate(self.body_ids) == b)[0])
                    for b in range(len(self.bodies))
                ],
            },
        }
        return particles
