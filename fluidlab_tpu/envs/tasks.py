"""The 10 FluidLab task envs (reference fluidlab/envs/*_env.py).

Agent specs inline the reference yaml configs
(fluidlab/envs/configs/agent_*.yaml); scene recipes cite their env files.
"""

from __future__ import annotations

import numpy as np

from fluidlab_tpu.config import materials as M
from fluidlab_tpu.envs import register
from fluidlab_tpu.envs.fluid_env import FluidEnv
from fluidlab_tpu.losses import (
    CirculationLoss,
    ScoopingLoss,
    StabilizingLoss,
    GatheringEasyLoss,
    GatheringOLoss,
    IceCreamDynamicLoss,
    IceCreamStaticLoss,
    LatteArtLoss,
    LatteArtStirLoss,
    MixingLoss,
    PouringLoss,
    TransportingLoss,
)
from fluidlab_tpu.utils.io import get_tgt_path


# ============================================================== LatteArt
@register("LatteArt-v0")
class LatteArtEnv(FluidEnv):
    """reference latteart_env.py:12-143."""

    horizon = 330
    horizon_action = 250
    _n_obs_ptcls_per_body = 1000
    action_range = np.array([-0.05, 0.05])
    max_substeps_local = 50
    gravity = (0.0, -20.0, 0.0)

    def __init__(self, **kwargs):
        self.target_file = get_tgt_path("LatteArt-v0.pkl")
        super().__init__(**kwargs)

    def setup_agent(self):
        # agent_latteart.yaml
        self.sim.setup_agent(
            dict(
                type="AgentInjector",
                effectors=[
                    dict(
                        type="Injector",
                        params=dict(
                            radius=0.0075, flux=2, init_pos=(0.5, 0.5, 0.5),
                            action_dim=3, inject_v=(0.0, -3.0, 0.0),
                            action_scale_p=(1.0, 1.0, 1.0),
                            action_scale_v=(1.0, 1.0, 1.0),
                            locally_random=True,
                        ),
                        mesh=dict(
                            file="pitcher.obj", pos=(0.14, 0.03, 0.0),
                            euler=(90.0, -15.0, 90.0), scale=(0.25, 0.25, 0.25),
                            material="POURER",
                        ),
                        boundary=dict(
                            type="cylinder", xz_radius=0.42,
                            xz_center=(0.5, 0.5), y_range=(0.65, 0.65),
                        ),
                    )
                ],
            )
        )

    def setup_statics(self):
        self.sim.add_static(
            file="cup.obj", pos=(0.63, 0.42, 0.5), euler=(0.0, 0.0, 0.0),
            scale=(1.2, 1.2, 1.2), material=M.CUP, has_dynamics=False,
        )

    def setup_bodies(self):
        self.sim.add_body(type="nowhere", n_particles=int(60000 * self.pool_scale), material=M.MILK)
        self.sim.add_body(
            type="cylinder", center=(0.5, 0.55, 0.5), height=0.1, radius=0.42,
            material=M.COFFEE,
        )

    def setup_boundary(self):
        self.sim.setup_boundary(
            type="cylinder", xz_radius=0.42, xz_center=(0.5, 0.5),
            y_range=(0.5, 0.95),
        )

    def setup_renderer(self):
        self.sim.setup_renderer(
            kind=self.renderer_type,
            res=(960, 960), camera_pos=(-0.15, 2.82, 2.5),
            camera_lookat=(0.5, 0.5, 0.5), fov=30,
        )

    def setup_loss(self):
        self.sim.setup_loss(
            loss_cls=LatteArtLoss, type=self.loss_type,
            target_file=self.target_file, weights={"chamfer": 1.0},
        )

    def demo_policy(self, user_input=False):
        """Scripted 3-cycle sine sweep (reference latteart_env.py:118-140);
        ``user_input=True`` -> interactive mouse (reference :114-117)."""
        from fluidlab_tpu.optimizer.policies import ActionsPolicy

        if user_input:
            from fluidlab_tpu.optimizer.policies import MousePolicy_vxz

            return MousePolicy_vxz(np.array([0.15, 0.65, 0.5]))

        comp_actions_p = np.zeros((1, self.sim.action_dim))
        comp_actions_v = np.zeros((self.horizon_action, self.sim.action_dim))
        init_p = np.array([0.15, 0.65, 0.5])
        x_range = 0.7
        current_p = np.array(init_p)
        amp_range = np.array([0.15, 0.25])
        for i in range(self.horizon_action):
            target_i = i + 1
            target_x = init_p[0] + target_i / self.horizon_action * x_range
            target_y = init_p[1]
            cycles = 3
            target_rad = target_i / self.horizon_action * (np.pi * 2) * cycles
            target_amp = amp_range[1] - np.abs(
                (target_i * 2 / self.horizon_action) - 1
            ) * (amp_range[1] - amp_range[0])
            target_z = np.sin(target_rad) * target_amp + 0.5
            target_p = np.array([target_x, target_y, target_z])
            comp_actions_v[i] = target_p - current_p
            current_p += comp_actions_v[i]
        comp_actions_p[0] = init_p
        return ActionsPolicy(np.vstack([comp_actions_v, comp_actions_p]))

    def trainable_policy(self, optim_cfg, init_range):
        from fluidlab_tpu.optimizer.policies import LatteArtPolicy

        return LatteArtPolicy(
            optim_cfg, init_range, self.sim.action_dim, self.horizon_action,
            self.action_range,
        )


# ========================================================== LatteArtStir
@register("LatteArtStir-v0")
class LatteArtStirEnv(FluidEnv):
    """reference latteartstir_env.py:12-129."""

    horizon = 500
    horizon_action = 500
    _n_obs_ptcls_per_body = 1000
    action_range = np.array([-0.01, 0.01])
    max_substeps_local = 50
    gravity = (0.0, -20.0, 0.0)

    def __init__(self, **kwargs):
        self.target_file = get_tgt_path("LatteArtStir-v0.pkl")
        super().__init__(**kwargs)

    def setup_agent(self):
        # agent_latteartstir.yaml
        self.sim.setup_agent(
            dict(
                type="AgentRigid",
                effectors=[
                    dict(
                        type="Rigid",
                        params=dict(init_pos=(0.5, 0.5, 0.5), action_dim=3),
                        mesh=dict(
                            file="stirrer.obj", scale=(0.6, 0.4, 0.6),
                            material="STIRRER", softness=100.0,
                        ),
                        boundary=dict(
                            type="cylinder", xz_radius=0.42,
                            xz_center=(0.5, 0.5), y_range=(0.05, 0.95),
                        ),
                    )
                ],
            )
        )

    def setup_statics(self):
        self.sim.add_static(
            file="cup.obj", pos=(0.63, 0.42, 0.5), euler=(0.0, 0.0, 0.0),
            scale=(1.2, 1.2, 1.2), material=M.CUP, has_dynamics=False,
        )

    def setup_bodies(self):
        self.sim.add_body(
            type="cylinder", center=(0.5, 0.56, 0.5), height=0.02,
            radius=0.42, material=M.MILK_VIS,
        )
        self.sim.add_body(
            type="cylinder", center=(0.5, 0.475, 0.5), height=0.15,
            radius=0.42, material=M.COFFEE_VIS,
        )

    def setup_boundary(self):
        self.sim.setup_boundary(
            type="cylinder", xz_radius=0.42, xz_center=(0.5, 0.5),
            y_range=(0.4, 0.95),
        )

    def setup_renderer(self):
        self.sim.setup_renderer(
            kind=self.renderer_type,
            camera_pos=(-0.15, 2.82, 2.5), camera_lookat=(0.5, 0.5, 0.5), fov=30
        )

    def setup_loss(self):
        self.sim.setup_loss(
            loss_cls=LatteArtStirLoss, type=self.loss_type,
            target_file=self.target_file, weights={"chamfer": 1.0},
        )

    def demo_policy(self, user_input=False):
        """The reference uses interactive mouse input (latteartstir_env.py
        :124-128, available here with user_input=True); headless
        fallback: a scripted figure-8 stir."""
        from fluidlab_tpu.optimizer.policies import ActionsPolicy

        if user_input:
            from fluidlab_tpu.optimizer.policies import MousePolicy_vxz

            return MousePolicy_vxz(np.array([0.5, 0.73, 0.5]))

        H, A = self.horizon_action, self.sim.action_dim
        comp_actions_v = np.zeros((H, A))
        init_p = np.array([0.5, 0.73, 0.5])
        current = init_p.copy()
        for i in range(H):
            th = i / H * 6 * np.pi
            target = np.array(
                [0.5 + 0.2 * np.sin(th), 0.73, 0.5 + 0.2 * np.sin(2 * th)]
            )
            comp_actions_v[i] = np.clip(target - current, -0.01, 0.01)
            current += comp_actions_v[i]
        return ActionsPolicy(np.vstack([comp_actions_v, init_p[None]]))

    def trainable_policy(self, optim_cfg, init_range):
        from fluidlab_tpu.optimizer.policies import LatteArtStirPolicy

        return LatteArtStirPolicy(
            optim_cfg, init_range, self.sim.action_dim, self.horizon_action,
            self.action_range, fix_dim=[1],
        )


# ============================================================== Pouring
@register("Pouring-v0")
class PouringEnv(FluidEnv):
    """reference pouring_env.py:12-97."""

    horizon = 1000
    horizon_action = 1000
    _n_obs_ptcls_per_body = 500
    action_range = np.array([-0.02, 0.02])
    max_substeps_local = 20
    gravity = (0.0, -20.0, 0.0)

    def setup_agent(self):
        # agent_pouring.yaml
        self.sim.setup_agent(
            dict(
                type="AgentPouring",
                params=dict(
                    collector_boundary=dict(
                        type="cube", lower=(0.0, 0.1, 0.0), upper=(1.0, 1.0, 1.0)
                    )
                ),
                effectors=[
                    dict(
                        type="Rigid",
                        params=dict(
                            init_pos=(0.5, 0.5, 0.5), action_dim=6,
                            action_scale_p=(1.0,) * 6, action_scale_v=(1.0,) * 6,
                        ),
                        mesh=dict(
                            file="glass.obj", file_vis="glass_vis.obj",
                            scale=(0.75, 0.65, 0.75), material="BOTTLE",
                        ),
                        boundary=dict(type="cube"),
                    )
                ],
            )
        )

    def setup_bodies(self):
        self.sim.add_body(
            type="cylinder", center=(0.6, 0.53, 0.5), height=0.2, radius=0.18,
            material=M.MILK,
        )
        self.sim.add_body(
            type="cylinder", center=(0.6, 0.73, 0.5), height=0.2, radius=0.18,
            material=M.WATER,
        )

    def setup_boundary(self):
        self.sim.setup_boundary(type="cube")

    def setup_renderer(self):
        self.sim.setup_renderer(
            kind=self.renderer_type,
            camera_pos=(0.5, 0.6, 3.5), camera_lookat=(0.5, 0.6, 0.5), fov=26
        )

    def setup_loss(self):
        self.sim.setup_loss(
            loss_cls=PouringLoss, type=self.loss_type,
            weights={"dist": 1.0, "attraction": 1.0},
        )

    def demo_policy(self, user_input=False):
        """Reference uses keyboard input (pouring_env.py:91-94, available
        here with user_input=True); headless fallback: tilt the glass
        about z progressively."""
        from fluidlab_tpu.optimizer.policies import ActionsPolicy

        if user_input:
            from fluidlab_tpu.optimizer.policies import KeyboardPolicy_wz

            return KeyboardPolicy_wz(
                np.array([0.6, 0.7, 0.5, 0.0, 0.0, 0.0]), v_ang=0.015
            )

        H, A = self.horizon_action, self.sim.action_dim
        v = np.zeros((H, A))
        v[:400, 5] = 0.012
        v[700:, 5] = -0.012
        p = np.array([0.6, 0.7, 0.5, 0.0, 0.0, 0.0])
        return ActionsPolicy(np.vstack([v, p[None]]))

    def trainable_policy(self, optim_cfg, init_range):
        from fluidlab_tpu.optimizer.policies import PouringPolicy

        return PouringPolicy(
            optim_cfg, init_range, self.sim.action_dim, self.horizon_action,
            self.action_range, fix_dim=[0, 1, 2, 3, 4],
        )


# ========================================================= GatheringEasy
@register("GatheringEasy-v0")
class GatheringEasyEnv(FluidEnv):
    """reference gatheringeasy_env.py:12-120."""

    horizon = 840
    horizon_action = 840
    _n_obs_ptcls_per_body = 500
    action_range = np.array([-0.003, 0.003])
    max_substeps_local = 50
    gravity = (0.0, -20.0, 0.0)

    plate_boundary = dict(
        type="cube", lower=(0.45, 0.25, 0.05), upper=(0.95, 0.95, 0.95)
    )

    def setup_agent(self):
        # agent_gatheringeasy.yaml
        self.sim.setup_agent(
            dict(
                type="AgentRigid",
                effectors=[
                    dict(
                        type="Rigid",
                        params=dict(init_pos=(0.5, 0.5, 0.5), action_dim=3),
                        mesh=dict(
                            file="plate.obj", scale=(0.2, 0.2, 0.2),
                            euler=(0.0, 90.0, 0.0), material="PLATE",
                            softness=100.0,
                        ),
                        boundary=self.plate_boundary,
                    )
                ],
            )
        )

    def setup_statics(self):
        self.sim.add_static(
            file="tank.obj", pos=(0.5, 0.4, 0.5), euler=(0.0, 0.0, 0.0),
            scale=(1.0, 0.92, 0.92), material=M.TANK, has_dynamics=False,
        )

    def setup_bodies(self):
        self.sim.add_body(
            type="cube", lower=(0.05, 0.3, 0.17), upper=(0.95, 0.45, 0.83),
            material=M.WATER,
        )
        self.sim.add_body(
            type="mesh", file="duck.obj", pos=(0.22, 0.5, 0.45),
            scale=(0.10, 0.10, 0.10), euler=(0, -75.0, 0.0),
            color=(1.0, 1.0, 0.3, 1.0), filling="grid", material=M.RIGID,
        )
        self.sim.add_body(
            type="mesh", file="duck.obj", pos=(0.28, 0.5, 0.57),
            scale=(0.10, 0.10, 0.10), euler=(0, -95.0, 0.0),
            color=(1.0, 0.5, 0.5, 1.0), filling="grid", material=M.RIGID,
        )

    def setup_boundary(self):
        self.sim.setup_boundary(
            type="cube", lower=(0.06, 0.3, 0.18), upper=(0.94, 0.95, 0.82)
        )

    def setup_renderer(self):
        self.sim.setup_renderer(
            kind=self.renderer_type,
            camera_pos=(-0.15, 2.82, 2.5), camera_lookat=(0.5, 0.5, 0.5), fov=30
        )

    def setup_loss(self):
        self.sim.setup_loss(
            loss_cls=GatheringEasyLoss, type=self.loss_type,
            matching_mat=M.RIGID, weights={"dist": 1.0},
        )

    def trainable_policy(self, optim_cfg, init_range):
        from fluidlab_tpu.optimizer.policies import GatheringPolicy

        return GatheringPolicy(
            optim_cfg, init_range, self.sim.action_dim, self.horizon_action,
            self.action_range, fix_dim=[1],
        )


# ============================================================ GatheringO
@register("GatheringO-v0")
class GatheringOEnv(GatheringEasyEnv):
    """reference gatheringo_env.py:12-130."""

    horizon = 3600
    horizon_action = 3600
    action_range = np.array([-0.003, 0.003])

    plate_boundary = dict(
        type="cube", lower=(0.05, 0.25, 0.05), upper=(0.95, 0.95, 0.35)
    )

    def setup_statics(self):
        self.sim.add_static(
            file="tank_O.obj", pos=(0.5, 0.4, 0.5), euler=(0.0, 0.0, 0.0),
            scale=(1.0, 0.92, 0.92), material=M.TANK, has_dynamics=True,
        )

    def setup_bodies(self):
        self.sim.add_body(
            type="cube", lower=(0.05, 0.3, 0.17), upper=(0.95, 0.45, 0.83),
            material=M.WATER,
        )
        self.sim.add_body(
            type="mesh", file="duck.obj", pos=(0.88, 0.5, 0.45),
            scale=(0.10, 0.10, 0.10), euler=(0, -75.0, 0.0),
            color=(1.0, 1.0, 0.3, 1.0), filling="grid", material=M.RIGID,
        )
        self.sim.add_body(
            type="mesh", file="duck.obj", pos=(0.25, 0.5, 0.78),
            scale=(0.10, 0.10, 0.10), euler=(0, -95.0, 0.0),
            color=(1.0, 0.5, 0.5, 1.0), filling="grid", material=M.RIGID,
        )

    def setup_loss(self):
        self.sim.setup_loss(
            loss_cls=GatheringOLoss, type=self.loss_type,
            matching_mat=M.RIGID, weights={"dist": 1.0},
        )

    def demo_policy(self, user_input=False):
        from fluidlab_tpu.optimizer.policies import ActionsPolicy

        comp_actions_p = np.zeros((1, self.sim.action_dim))
        comp_actions_v = np.zeros((self.horizon_action, self.sim.action_dim))
        comp_actions_v[:] = np.array([0.003, 0.0, 0.0])
        comp_actions_p[0] = np.array([0.5, 0.45, 0.5])
        return ActionsPolicy(np.vstack([comp_actions_v, comp_actions_p]))

    def trainable_policy(self, optim_cfg, init_range):
        from fluidlab_tpu.optimizer.policies import GatheringOPolicy

        return GatheringOPolicy(
            optim_cfg, init_range, self.sim.action_dim, self.horizon_action,
            self.action_range, fix_dim=[1, 2],
        )


# ======================================================= IceCreamDynamic
@register("IceCreamDynamic-v0")
class IceCreamDynamicEnv(FluidEnv):
    """reference icecreamdynamic_env.py:12-172."""

    horizon = 900
    horizon_action = 900
    _n_obs_ptcls_per_body = 2000
    action_range = np.array([-0.005, 0.005])
    max_substeps_local = 40
    gravity = (0.0, -10.0, 0.0)

    def __init__(self, **kwargs):
        self.target_file = get_tgt_path("IceCreamDynamic-v0.pkl")
        super().__init__(**kwargs)

    def setup_agent(self):
        # agent_icecreamdynamic.yaml
        self.sim.setup_agent(
            dict(
                type="AgentIceCreamDynamic",
                params=dict(inject_till=7700),
                effectors=[
                    dict(
                        type="BallInjector",
                        params=dict(
                            locally_random=True, radius=0.035, flux=10,
                            init_pos=(0.5, 0.8, 0.5),
                            inject_v=(0.0, -0.4, 0.0), action_dim=3,
                        ),
                        boundary=dict(type="cube"),
                    ),
                    dict(
                        type="Rigid",
                        params=dict(init_pos=(0.5, 0.5, 0.5), action_dim=3),
                        mesh=dict(
                            file="cone_tip.obj", file_vis="cone.obj",
                            scale=(0.726, 0.726, 0.726),
                            euler=(-90.0, 0.0, 30.0), material="CONE",
                            softness=100.0,
                        ),
                        boundary=dict(type="cube"),
                    ),
                ],
            )
        )

    def setup_statics(self):
        self.sim.add_static(
            file="icecream_dispenser.obj", pos=(-0.32, 0.96, 0.24),
            euler=(0.0, 0.0, 0.0), scale=(2.5, 2.5, 2.5),
            material=M.DISPENSER, has_dynamics=False,
        )

    def setup_bodies(self):
        self.sim.add_body(type="nowhere", n_particles=int(100000 * self.pool_scale), material=M.ICECREAM)

    def setup_boundary(self):
        self.sim.setup_boundary(type="cube")

    def setup_renderer(self):
        self.sim.setup_renderer(
            kind=self.renderer_type,
            res=(960, 960), camera_pos=(3.96, 1.72, 3.99),
            camera_lookat=(3.24, 1.53, 3.32), fov=30,
        )

    def setup_loss(self):
        self.sim.setup_loss(
            loss_cls=IceCreamDynamicLoss, type=self.loss_type,
            target_file=self.target_file, weights={"chamfer": 1.0},
        )

    def demo_policy(self, user_input=False):
        """Hold-then-spiral dispensing (reference icecreamdynamic_env.py
        :113-165)."""
        from fluidlab_tpu.optimizer.policies import ActionsPolicy

        comp_actions_p = np.zeros((1, self.sim.action_dim))
        comp_actions_v = np.zeros((900, self.sim.action_dim))
        init_center = np.array([0.5, 0.3, 0.5])
        rad_v_lin = 0.0042
        init_radius = 0.15
        theta = np.pi
        init_p = init_center + np.array(
            [init_radius * np.cos(theta), 0, init_radius * np.sin(theta)]
        )
        current_p = np.array(init_p)
        radius_v = 4e-5
        horizon_0, horizon_2 = 168, 20
        horizon_1 = 900 - horizon_0 - horizon_2
        r = init_radius
        for i in range(horizon_0):
            comp_actions_v[i] = init_p - current_p
            current_p += comp_actions_v[i]
        for i in range(horizon_0, horizon_0 + horizon_1):
            t = i - horizon_0
            r = init_radius - radius_v * t
            theta += rad_v_lin / r
            target_p = np.array(
                [
                    init_center[0] + r * np.cos(theta),
                    init_center[1],
                    init_center[2] + r * np.sin(theta),
                ]
            )
            comp_actions_v[i] = target_p - current_p
            current_p += comp_actions_v[i]
        for i in range(horizon_0 + horizon_1, 900):
            t = i - horizon_0 - horizon_1
            theta += rad_v_lin / r * (1 - t / horizon_2)
            target_p = np.array(
                [
                    init_center[0] + r * np.cos(theta),
                    init_center[1],
                    init_center[2] + r * np.sin(theta),
                ]
            )
            comp_actions_v[i] = target_p - current_p
            current_p += comp_actions_v[i]
        comp_actions_p[0] = init_p
        comp_actions_v = comp_actions_v[: self.horizon_action]
        return ActionsPolicy(np.vstack([comp_actions_v, comp_actions_p]))

    def trainable_policy(self, optim_cfg, init_range):
        from fluidlab_tpu.optimizer.policies import IceCreamDynamicPolicy

        return IceCreamDynamicPolicy(
            optim_cfg, init_range, self.sim.action_dim, self.horizon_action,
            self.action_range,
        )


# ======================================================== IceCreamStatic
@register("IceCreamStatic-v0")
class IceCreamStaticEnv(FluidEnv):
    """reference icecreamstatic_env.py:12-143."""

    horizon = 550
    horizon_action = 500
    _n_obs_ptcls_per_body = 2000
    action_range = np.array([-0.005, 0.005])
    max_substeps_local = 20
    gravity = (0.0, -5.0, 0.0)

    def __init__(self, **kwargs):
        self.target_file = get_tgt_path("IceCreamStatic-v0.pkl")
        super().__init__(**kwargs)

    def setup_agent(self):
        # agent_icecreamstatic.yaml
        self.sim.setup_agent(
            dict(
                type="AgentInjector",
                effectors=[
                    dict(
                        type="Injector",
                        params=dict(
                            locally_random=True, radius=0.022, flux=6,
                            init_pos=(0.5, 0.85, 0.5),
                            inject_v=(0.0, -1.0, 0.0), action_dim=3,
                        ),
                        boundary=dict(type="cube"),
                    )
                ],
            )
        )

    def setup_statics(self):
        self.sim.add_static(
            file="cone.obj", pos=(0.5, 0.1, 0.5), euler=(-90.0, 0.0, 30.0),
            scale=(0.435, 0.435, 0.435), material=M.CONE, has_dynamics=True,
        )

    def setup_bodies(self):
        self.sim.add_body(type="nowhere", n_particles=int(100000 * self.pool_scale), material=M.ICECREAM1)

    def setup_boundary(self):
        self.sim.setup_boundary(type="cube")

    def setup_renderer(self):
        self.sim.setup_renderer(
            kind=self.renderer_type,
            camera_pos=(4.48, 2.41, -0.84), camera_lookat=(3.64, 1.95, -0.56),
            fov=15,
        )

    def setup_loss(self):
        self.sim.setup_loss(
            loss_cls=IceCreamStaticLoss, type=self.loss_type,
            target_file=self.target_file, weights={"chamfer": 1.0},
        )

    def demo_policy(self, user_input=False):
        """Rising spiral (reference icecreamstatic_env.py:107-138)."""
        from fluidlab_tpu.optimizer.policies import ActionsPolicy

        comp_actions_p = np.zeros((1, self.sim.action_dim))
        comp_actions_v = np.zeros((self.horizon_action, self.sim.action_dim))
        init_center = np.array([0.5, 0.36, 0.5])
        y_range = 0.26
        init_radius, final_radius = 0.12, 0.01
        init_p = init_center + np.array([init_radius, 0, 0])
        current_p = np.array(init_p)
        init_rad_v = 0.01
        final_rad_v = init_rad_v * init_radius / final_radius
        theta = 0.0
        horizon_1 = 700
        for i in range(self.horizon_action):
            t = i
            rad_v = (final_rad_v - init_rad_v) * t / horizon_1 + init_rad_v
            theta += rad_v
            r = t / horizon_1 * (final_radius - init_radius) + init_radius
            target_p = np.array(
                [
                    init_center[0] + r * np.cos(theta),
                    init_center[1] + y_range * t / horizon_1,
                    init_center[2] + r * np.sin(theta),
                ]
            )
            comp_actions_v[i] = target_p - current_p
            current_p += comp_actions_v[i]
        comp_actions_p[0] = init_p
        return ActionsPolicy(np.vstack([comp_actions_v, comp_actions_p]))

    def trainable_policy(self, optim_cfg, init_range):
        from fluidlab_tpu.optimizer.policies import IceCreamStaticPolicy

        return IceCreamStaticPolicy(
            optim_cfg, init_range, self.sim.action_dim, self.horizon_action,
            self.action_range,
        )


# ========================================================== Transporting
@register("Transporting-v0")
class TransportingEnv(FluidEnv):
    """reference transporting_env.py:12-133 — zero gravity, z locked
    (2.5-D), jet-bot injector + collector."""

    horizon = 1000
    horizon_action = 1000
    _n_obs_ptcls_per_body = 500
    action_range = np.array([-0.01, 0.01])
    max_substeps_local = 20
    gravity = (0.0, 0.0, 0.0)

    def setup_agent(self):
        # agent_transporting.yaml
        self.sim.setup_agent(
            dict(
                type="AgentJetBot",
                params=dict(
                    collector_boundary=dict(
                        type="cube", lower=(0.1, 0.1, 0.475),
                        upper=(0.9, 0.9, 0.525),
                    )
                ),
                effectors=[
                    dict(
                        type="Injector",
                        params=dict(
                            randomize_inject_v=False, radius=0.015, flux=4,
                            init_pos=(0.5, 0.8, 0.5),
                            inject_v=(-3.0, 0.0, 0.0),
                            inject_p=(-0.07, 0.0, 0.0), action_dim=6,
                            action_scale_p=(1.0,) * 6,
                            action_scale_v=(1.0, 1.0, 1.0, 5.0, 5.0, 5.0),
                        ),
                        mesh=dict(
                            file="jetbot.obj", pos=(0.0, 0.0, 0.016),
                            scale=(0.15, 0.15, 0.15), material="ROBOT",
                        ),
                        boundary=dict(
                            type="cube", lower=(0.1, 0.1, 0.1),
                            upper=(0.9, 0.9, 0.9),
                        ),
                    )
                ],
            )
        )

    def setup_bodies(self):
        self.sim.add_body(type="nowhere", n_particles=int(200000 * self.pool_scale), material=M.WATER)
        self.sim.add_body(
            type="cube", lower=(0.275, 0.475, 0.475), size=(0.05, 0.05, 0.05),
            euler=(45.0, 45.0, 45.0), color=(1.0, 0.5, 0.5, 1.0),
            filling="natural", material=M.RIGID_HEAVY,
        )

    def setup_boundary(self):
        self.sim.setup_boundary(
            type="cube", lower=(0.05, 0.05, 0.45), upper=(0.95, 0.95, 0.55),
            restitution=0.0, lock_dims=(2,),
        )

    def setup_renderer(self):
        self.sim.setup_renderer(
            kind=self.renderer_type,
            camera_pos=(0.5, 0.5, 3.0), camera_lookat=(0.5, 0.5, 0.5), fov=22
        )

    def setup_loss(self):
        self.sim.setup_loss(
            loss_cls=TransportingLoss, type=self.loss_type, weights={"dist": 1.0}
        )

    def demo_policy(self, user_input=False):
        """Reference uses keyboard input (transporting_env.py:127-130,
        available here with user_input=True); headless fallback: hold."""
        from fluidlab_tpu.optimizer.policies import ActionsPolicy

        p = np.array([0.5, 0.2, 0.5, 0.0, 0.0, 0.0])
        if user_input:
            from fluidlab_tpu.optimizer.policies import (
                KeyboardPolicy_vxy_wz,
            )

            return KeyboardPolicy_vxy_wz(p, v_ang=0.003)
        H, A = self.horizon_action, self.sim.action_dim
        v = np.zeros((H, A))
        return ActionsPolicy(np.vstack([v, p[None]]))

    def trainable_policy(self, optim_cfg, init_range):
        from fluidlab_tpu.optimizer.policies import TransportingPolicy

        return TransportingPolicy(
            optim_cfg, init_range, self.sim.action_dim, self.horizon_action,
            self.action_range, fix_dim=[1, 2, 3, 4],
        )


# ================================================================ Mixing
@register("Mixing-v0")
class MixingEnv(FluidEnv):
    """reference mixing_env.py:12-121."""

    horizon = 2000
    horizon_action = 2000
    _n_obs_ptcls_per_body = 1000
    action_range = np.array([-0.007, 0.007])
    max_substeps_local = 50
    gravity = (0.0, -20.0, 0.0)

    def setup_agent(self):
        # agent_mixing.yaml
        self.sim.setup_agent(
            dict(
                type="AgentRigid",
                effectors=[
                    dict(
                        type="Rigid",
                        params=dict(init_pos=(0.5, 0.5, 0.5), action_dim=3),
                        mesh=dict(
                            file="stirrer.obj", scale=(0.6, 0.6, 0.6),
                            material="STIRRER", softness=100.0,
                        ),
                        boundary=dict(
                            type="cylinder", xz_radius=0.42,
                            xz_center=(0.5, 0.5), y_range=(0.05, 0.95),
                        ),
                    )
                ],
            )
        )

    def setup_statics(self):
        self.sim.add_static(
            file="cup.obj", pos=(0.63, 0.42, 0.5), euler=(0.0, 0.0, 0.0),
            scale=(1.2, 1.2, 1.2), material=M.CUP, has_dynamics=False,
        )

    def setup_bodies(self):
        self.sim.add_body(
            type="cube", lower=(0.425, 0.55, 0.425), upper=(0.575, 0.7, 0.575),
            material=M.MILK_VIS,
        )
        self.sim.add_body(
            type="cylinder", center=(0.5, 0.475, 0.5), height=0.15,
            radius=0.42, material=M.COFFEE_VIS,
        )

    def setup_boundary(self):
        self.sim.setup_boundary(
            type="cylinder", xz_radius=0.42, xz_center=(0.5, 0.5),
            y_range=(0.4, 0.95),
        )

    def setup_renderer(self):
        self.sim.setup_renderer(
            kind=self.renderer_type,
            camera_pos=(-0.15, 2.82, 2.5), camera_lookat=(0.5, 0.5, 0.5), fov=30
        )

    def setup_loss(self):
        self.sim.setup_loss(
            loss_cls=MixingLoss, type=self.loss_type, weights={"dist": 1.0}
        )

    def demo_policy(self, user_input=False):
        from fluidlab_tpu.optimizer.policies import ActionsPolicy

        H, A = self.horizon_action, self.sim.action_dim
        v = np.zeros((H, A))
        p = np.array([0.5, 0.73, 0.5])
        if user_input:
            from fluidlab_tpu.optimizer.policies import MousePolicy_vxz

            return MousePolicy_vxz(p)  # reference mixing_env.py:115-118
        return ActionsPolicy(np.vstack([v, p[None]]))

    def trainable_policy(self, optim_cfg, init_range):
        from fluidlab_tpu.optimizer.policies import MixingPolicy

        return MixingPolicy(
            optim_cfg, init_range, self.sim.action_dim, self.horizon_action,
            self.action_range, fix_dim=[1],
        )


# =========================================================== Circulation
@register("Circulation-v0")
class CirculationEnv(FluidEnv):
    """reference circulation_env.py:12-123 — smoke-only task (10 dummy
    particles), AirCon agent with 8-D action."""

    horizon = 1000
    horizon_action = 1000
    _n_obs_ptcls_per_body = 200
    action_range = np.array([-0.1, 0.1])
    max_substeps_local = 100
    gravity = (0.0, -20.0, 0.0)

    def setup_agent(self):
        # agent_circulation.yaml
        self.sim.setup_agent(
            dict(
                type="AgentCirculation",
                effectors=[
                    dict(
                        type="AirCon",
                        params=dict(
                            init_pos=(0.8, 0.8, 0.5), action_dim=8,
                            action_scale_p=(1.0,) * 8,
                            action_scale_v=(1.0, 1.0, 1.0, 1.0, 1.0, 1.0,
                                            100000.0, 50.0),
                            inject_v=(-0.3, 0.0, 1.0),
                        ),
                        boundary=dict(type="cube"),
                    )
                ],
            )
        )

    def setup_statics(self):
        self.sim.add_static(
            file="room.obj", pos=(0.5, 0.5, 0.5), euler=(0.0, 0.0, 0.0),
            scale=(1.4, 3.0, 1.4), material=M.PILLAR, sdf_res=128,
            has_dynamics=True,
        )

    def setup_bodies(self):
        self.sim.add_body(type="nowhere", n_particles=10, material=M.WATER)

    smoke_res = 128
    smoke_solver_iters = 50

    def setup_smoke_field(self):
        r = self.smoke_res
        self.sim.setup_smoke_field(
            res=r, dt=0.03, solver_iters=self.smoke_solver_iters,
            decay=0.99, q_dim=1,
            lower_y=int(60 * r / 128), higher_y=int(68 * r / 128),
        )

    def setup_boundary(self):
        self.sim.setup_boundary(type="cube")

    def setup_renderer(self):
        self.sim.setup_renderer(
            kind=self.renderer_type,
            camera_pos=(0.5, 12.0, 0.501), camera_lookat=(0.5, 0.5, 0.5), fov=5
        )

    def setup_loss(self):
        self.sim.setup_loss(
            loss_cls=CirculationLoss, type=self.loss_type,
            weights={"temp": 1.0}, grid_res=self.smoke_res,
        )

    def demo_policy(self, user_input=False):
        from fluidlab_tpu.optimizer.policies import ActionsPolicy

        comp_actions_p = np.zeros((1, self.sim.action_dim))
        comp_actions_v = np.zeros((self.horizon_action, self.sim.action_dim))
        comp_actions_p[0] = np.array([0.55, 0.5, 0.27, 0.0, 0.0, 0.0, 0.0, 0.0])
        comp_actions_v[:] = np.array([0.0, 0.0, 0.0, 0.0, 0.1, 0.0, 0.02, 0.04])
        return ActionsPolicy(np.vstack([comp_actions_v, comp_actions_p]))

    def trainable_policy(self, optim_cfg, init_range):
        from fluidlab_tpu.optimizer.policies import CirculationPolicy

        return CirculationPolicy(
            optim_cfg, init_range, self.sim.action_dim, self.horizon_action,
            self.action_range, fix_dim=[0, 1, 2, 3, 5, 6, 7],
        )


# ============================================================== Scooping
@register("Scooping-v0")
class ScoopingEnv(FluidEnv):
    """Scooping (beyond-reference: registered but not shipped in the
    reference, envs/__init__.py:4-10) — scoop the floating rigid ball
    out of the water tank with a bowl-shaped ladle and lift it above
    ``ScoopingLoss.lift_y``."""

    horizon = 500
    horizon_action = 500
    _n_obs_ptcls_per_body = 500
    action_range = np.array([-0.003, 0.003])
    max_substeps_local = 50

    def setup_agent(self):
        self.sim.setup_agent(
            dict(
                type="AgentRigid",
                effectors=[
                    dict(
                        type="Rigid",
                        params=dict(init_pos=(0.3, 0.7, 0.5), action_dim=3),
                        mesh=dict(
                            file="bowl.obj", scale=(0.12, 0.12, 0.12),
                            euler=(0.0, 0.0, 0.0), material="BOWL",
                            softness=100.0,
                        ),
                        boundary=dict(
                            type="cube", lower=(0.15, 0.3, 0.15),
                            upper=(0.85, 0.9, 0.85),
                        ),
                    )
                ],
            )
        )

    def setup_statics(self):
        self.sim.add_static(
            file="tank.obj", pos=(0.5, 0.4, 0.5), euler=(0.0, 0.0, 0.0),
            scale=(1.0, 0.92, 0.92), material=M.TANK, has_dynamics=False,
        )

    def setup_bodies(self):
        self.sim.add_body(
            type="cube", lower=(0.05, 0.3, 0.17), upper=(0.95, 0.5, 0.83),
            material=M.WATER,
        )
        self.sim.add_body(
            type="ball", center=(0.6, 0.55, 0.5), radius=0.06,
            color=(1.0, 0.8, 0.2, 1.0), filling="grid",
            material=M.RIGID_LIGHT,
        )

    def setup_boundary(self):
        self.sim.setup_boundary(
            type="cube", lower=(0.06, 0.3, 0.18), upper=(0.94, 0.95, 0.82)
        )

    def setup_renderer(self):
        self.sim.setup_renderer(
            kind=self.renderer_type,
            camera_pos=(-0.15, 2.0, 2.5), camera_lookat=(0.5, 0.5, 0.5),
            fov=30,
        )

    def setup_loss(self):
        self.sim.setup_loss(
            loss_cls=ScoopingLoss, type=self.loss_type,
            matching_mat=M.RIGID_LIGHT, weights={"lift": 1.0},
        )

    def demo_policy(self, user_input=False):
        """Scripted dip -> slide-under -> lift trajectory."""
        from fluidlab_tpu.optimizer.policies import ActionsPolicy

        H, dim = self.horizon_action, self.sim.action_dim
        v = np.zeros((H, dim), np.float32)
        lim = float(self.action_range[1])
        # approach + dip under the ball, then lift straight up
        v[0:150] = np.array([lim, -lim, 0.0]) * 0.9
        v[150:250] = np.array([lim * 0.5, 0.0, 0.0])
        v[250:460] = np.array([0.0, lim, 0.0]) * 0.95
        # the p row must place the effector at its start pose —
        # apply_action_p sets pos unconditionally (engine/mpm.py)
        p = np.array([[0.3, 0.7, 0.5]], np.float32)
        return ActionsPolicy(np.concatenate([v, p], axis=0))

    def trainable_policy(self, optim_cfg, init_range):
        from fluidlab_tpu.optimizer.policies import TrainablePolicy

        return TrainablePolicy(
            optim_cfg, init_range, self.sim.action_dim, self.horizon_action,
            self.action_range,
        )


# =========================================================== Stabilizing
@register("Stabilizing-v0")
class StabilizingEnv(FluidEnv):
    """Stabilizing (beyond-reference, like Scooping) — an elastic column
    sags and wobbles under gravity; the plate agent must keep its
    particles at their rest positions (StabilizingLoss)."""

    horizon = 400
    horizon_action = 400
    _n_obs_ptcls_per_body = 500
    action_range = np.array([-0.003, 0.003])
    max_substeps_local = 40

    def setup_agent(self):
        self.sim.setup_agent(
            dict(
                type="AgentRigid",
                effectors=[
                    dict(
                        type="Rigid",
                        params=dict(init_pos=(0.5, 0.62, 0.5), action_dim=3),
                        mesh=dict(
                            file="plate.obj", scale=(0.2, 0.2, 0.2),
                            euler=(0.0, 90.0, 0.0), material="PLATE",
                            softness=100.0,
                        ),
                        boundary=dict(
                            type="cube", lower=(0.2, 0.3, 0.2),
                            upper=(0.8, 0.9, 0.8),
                        ),
                    )
                ],
            )
        )

    def setup_bodies(self):
        self.sim.add_body(
            type="cube", lower=(0.44, 0.1, 0.44), upper=(0.56, 0.6, 0.56),
            material=M.ELASTIC,
        )

    def setup_boundary(self):
        self.sim.setup_boundary(
            type="cube", lower=(0.05, 0.05, 0.05), upper=(0.95, 0.95, 0.95)
        )

    def setup_renderer(self):
        self.sim.setup_renderer(
            kind=self.renderer_type,
            camera_pos=(1.6, 1.2, 1.8), camera_lookat=(0.5, 0.4, 0.5),
            fov=30,
        )

    def setup_loss(self):
        self.sim.setup_loss(
            loss_cls=StabilizingLoss, type=self.loss_type,
            matching_mat=M.ELASTIC, weights={"dist": 1.0},
        )

    def demo_policy(self, user_input=False):
        """Gentle sinusoidal hover above the column (goal-free task —
        the demo just shows the scene; training does the work)."""
        from fluidlab_tpu.optimizer.policies import ActionsPolicy

        H, dim = self.horizon_action, self.sim.action_dim
        v = np.zeros((H, dim), np.float32)
        t = np.arange(H)
        v[:, 0] = 0.3 * float(self.action_range[1]) * np.sin(t / 40.0)
        p = np.array([[0.5, 0.62, 0.5]], np.float32)
        return ActionsPolicy(np.concatenate([v, p], axis=0))

    def trainable_policy(self, optim_cfg, init_range):
        from fluidlab_tpu.optimizer.policies import TrainablePolicy

        return TrainablePolicy(
            optim_cfg, init_range, self.sim.action_dim, self.horizon_action,
            self.action_range,
        )
