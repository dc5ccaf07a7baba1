"""FluidSim — the simulation facade (reference TaichiEnv equivalent).

Owns scene construction (agent, statics, bodies, boundary, smoke, loss,
renderer) and the built artifacts: a static ``SimCfg``, a ``SceneParams``
pytree, and the initial ``SimState``.  Mirrors the reference facade API
(reference fluidlab/fluidengine/taichi_env.py:17-223): setup_agent,
setup_boundary, add_static, add_body, setup_smoke_field, setup_loss,
build, step, get/set_state, apply_agent_action_p — but stepping and
differentiation are pure jitted functions over the state pytree instead of
mutating device fields.
"""

from __future__ import annotations

import copy
import os
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from fluidlab_tpu.config import materials as M
from fluidlab_tpu.core.quat import euler_to_quat_np, scale_to_T_np, trans_quat_to_T_np
from fluidlab_tpu.engine import meshio
from fluidlab_tpu.engine.bodies import Bodies
from fluidlab_tpu.engine.boundaries import create_boundary
from fluidlab_tpu.engine.config import (
    AgentCfg,
    ColliderCfg,
    CollectorCfg,
    EffectorCfg,
    SimCfg,
    SmokeCfg,
)
from fluidlab_tpu.engine.mpm import apply_action_p as _apply_action_p
from fluidlab_tpu.engine.mpm import make_step
from fluidlab_tpu.engine.rollout import make_rollout
from fluidlab_tpu.engine.scene import (
    SceneParams,
    grid_cell_positions,
    particle_params_from_properties,
)
from fluidlab_tpu.engine.sdf import ColliderParams, precompute_static_grid, voxel_gradient
from fluidlab_tpu.engine.types import (
    EffectorState,
    ParticleState,
    SimState,
    init_effector_state,
)
from fluidlab_tpu.utils.misc import eval_str


class StaticObject:
    """A static mesh in the scene (reference meshes/static.py).  Colliding
    statics get precomputed SDF grids; non-colliding ones are visual-only
    (reference gates collision on has_dynamics, static.py:83)."""

    def __init__(self, file, pos=(0, 0, 0), euler=(0, 0, 0), scale=(1, 1, 1),
                 material=M.CUP, has_dynamics=False, sdf_res=128, file_vis=None):
        self.file = file
        self.file_vis = file_vis or file
        self.pos = np.asarray(eval_str(pos), dtype=np.float64)
        self.euler = tuple(eval_str(euler))
        self.scale = np.asarray(eval_str(scale), dtype=np.float64)
        self.material = material
        self.has_dynamics = has_dynamics
        self.sdf_res = sdf_res
        self.friction = M.FRICTION.get(material, 0.0)

        quat = euler_to_quat_np(self.euler)
        self.T_init = trans_quat_to_T_np(self.pos, quat) @ scale_to_T_np(self.scale)
        if has_dynamics:
            data = meshio.compute_sdf_data(file, sdf_res)
            # world -> voxels (statics live in world frame; reference
            # mesh.py:122-127 folds inv(T_init) into the transform)
            self.T_world_to_voxels = data["T_mesh_to_voxels"] @ np.linalg.inv(self.T_init)
            self.sdf_voxels = data["voxels"]


_AGENT_TYPE_DEFAULTS = {
    # reference agent subclasses -> declarative behavior (agents/*.py)
    "AgentRigid": dict(collide_type="particle"),
    "AgentInjector": dict(collide_type=None),
    "AgentPouring": dict(collide_type="both"),
    "AgentJetBot": dict(collide_type=None, collector_mat=M.WATER),
    "AgentIceCreamDynamic": dict(
        collide_type="particle", collide_y_gate=0.25, action_effector=1,
        clip_action=(-1.0, 1.0), clip_action_p=(0.05, 0.95),
    ),
    "AgentCirculation": dict(collide_type=None),
}

_EFFECTOR_KIND = {
    "Rigid": "rigid",
    "Injector": "injector",
    "BallInjector": "ball_injector",
    "AirCon": "aircon",
}


class FluidSim:
    def __init__(
        self,
        dim=3,
        quality=1,
        particle_density=1e6,
        max_substeps_local=50,
        max_substeps_global=100000,
        horizon=100,
        ckpt_dest=None,  # accepted for API parity; remat replaces it
        gravity=(0.0, -10.0, 0.0),
        seed=0,
        transfer="auto",  # 'auto' | 'portable' | 'pallas' | 'regions'
    ):
        self.dim = dim
        self.quality = quality
        self.particle_density = particle_density
        self.horizon = horizon
        self.gravity = tuple(gravity)
        self.transfer = transfer
        # remat window in control steps (reference max_substeps_local is in
        # substeps, mpm_simulator.py:27-31)
        self.window = max(1, max_substeps_local // 10)
        self.seed = seed
        self.t = 0

        self.agent_spec = None
        self.boundary = None
        self.statics: list[StaticObject] = []
        # visual records for rigid effectors with meshes (host-side,
        # consumed by render/native_renderer.py to draw the agent at its
        # live pose — reference renders agent meshes via
        # agent.render(), agents/agent.py role)
        self.effector_visuals: list[dict] = []
        self.bodies = Bodies(dim=dim, particle_density=particle_density)
        self.smoke_cfg: Optional[SmokeCfg] = None
        self.loss = None
        self.renderer = None
        self._built = False

    # ------------------------------------------------------------ scene API
    def setup_agent(self, agent_cfg: dict):
        self.agent_spec = copy.deepcopy(agent_cfg)

    def setup_boundary(self, **kwargs):
        self.boundary = create_boundary(**kwargs)

    def add_static(self, **kwargs):
        self.statics.append(StaticObject(**kwargs))

    def add_body(self, **kwargs):
        self.bodies.add_body(**kwargs)

    def setup_smoke_field(self, **kwargs):
        self.smoke_cfg = SmokeCfg(**kwargs)

    def setup_loss(self, loss_cls, **kwargs):
        self.loss = loss_cls(max_loss_steps=self.horizon, **kwargs)

    def setup_renderer(self, kind="point", **kwargs):
        """kind='point' (matplotlib-free rasterizer) or 'native' (the
        C++ fluid-surface renderer, reference GLRenderer role)."""
        if kind == "native":
            from fluidlab_tpu.render.native_renderer import NativeRenderer

            self.renderer = NativeRenderer(**kwargs)
        else:
            from fluidlab_tpu.render.pointcloud import PointRenderer

            self.renderer = PointRenderer(**kwargs)

    # ------------------------------------------------------------- building
    def _build_agent(self):
        spec = self.agent_spec
        if spec is None:
            return None, (), (), ()
        defaults = dict(_AGENT_TYPE_DEFAULTS.get(spec["type"], {}))
        params = spec.get("params", {}) or {}

        eff_cfgs, colliders, inj_rand, act_ranges = [], [], [], []
        self.effector_visuals = []
        rng = np.random.default_rng(self.seed)
        total_substeps = self.horizon * 10

        for espec in spec["effectors"]:
            ep = dict(espec.get("params", {}) or {})
            kind = _EFFECTOR_KIND[espec["type"]]
            boundary = create_boundary(**espec["boundary"])
            mesh_cfg = espec.get("mesh")
            collider_cfg = None
            collider_params = None
            if mesh_cfg is not None and kind == "rigid":
                file = mesh_cfg["file"]
                sdf_res = mesh_cfg.get("sdf_res", 128)
                data = meshio.compute_sdf_data(file, sdf_res)
                pos = np.asarray(eval_str(mesh_cfg.get("pos", (0, 0, 0))), dtype=np.float64)
                euler = tuple(eval_str(mesh_cfg.get("euler", (0, 0, 0))))
                scale = np.asarray(eval_str(mesh_cfg.get("scale", (1, 1, 1))), dtype=np.float64)
                T_init = trans_quat_to_T_np(pos, euler_to_quat_np(euler)) @ scale_to_T_np(scale)
                T = data["T_mesh_to_voxels"] @ np.linalg.inv(T_init)
                mat = mesh_cfg.get("material", "CUP")
                mat_id = getattr(M, mat) if isinstance(mat, str) else mat
                collider_cfg = ColliderCfg(
                    friction=M.FRICTION.get(mat_id, 0.0),
                    softness=float(mesh_cfg.get("softness", 0.0)),
                    has_dynamics=True,
                    voxel_res=sdf_res,
                )
                collider_params = ColliderParams(
                    sdf=jnp.asarray(data["voxels"]),
                    grad=jnp.asarray(
                        voxel_gradient(data["voxels"]).astype(np.float32)
                    ),
                    T_mesh_to_voxels=jnp.asarray(T.astype(np.float32)),
                    R_vox_to_mesh=jnp.asarray(
                        np.linalg.inv(T[:3, :3]).astype(np.float32)
                    ),
                )
                # visual record: verts drawn at the effector's live
                # pose are T_init @ v_normalized rotated/translated by
                # state.effectors[i].{quat,pos} — the inverse of the
                # collider's world->local map above
                self.effector_visuals.append(dict(
                    index=len(eff_cfgs),
                    file=mesh_cfg.get("file_vis", file),
                    T_init=T_init,
                    material=mat_id,
                ))

            flux = int(ep.get("flux", 0))
            radius = float(ep.get("radius", 0.0))
            rand_table = None
            if kind in ("injector", "ball_injector") and flux > 0:
                L = total_substeps
                if kind == "ball_injector":
                    # rejection-sampled ball offsets (reference
                    # injector.py:220-238)
                    out = []
                    need = L * flux
                    while sum(len(o) for o in out) < need:
                        cand = rng.uniform(-radius, radius, size=(need, 3))
                        cand = cand[np.linalg.norm(cand, axis=1) <= radius]
                        out.append(cand)
                    rand_table = np.concatenate(out)[:need].reshape(L, flux, 3)
                else:
                    rand_table = rng.uniform(size=(L, flux, 3))
                rand_table = jnp.asarray(rand_table.astype(np.float32))

            eff_cfgs.append(
                EffectorCfg(
                    kind=kind,
                    action_dim=int(ep.get("action_dim", 3)),
                    action_scale_v=tuple(eval_str(ep.get("action_scale_v", (1.0,) * 3))),
                    action_scale_p=tuple(eval_str(ep.get("action_scale_p", (1.0,) * 3))),
                    init_pos=tuple(eval_str(ep.get("init_pos", (0.5, 0.5, 0.5)))),
                    init_euler=tuple(eval_str(ep.get("init_euler", (0.0, 0.0, 0.0)))),
                    boundary=boundary,
                    collider=collider_cfg,
                    flux=flux,
                    radius=radius,
                    inject_v=tuple(eval_str(ep.get("inject_v", (0.0, 0.0, 0.0)))),
                    inject_p=tuple(eval_str(ep.get("inject_p", (0.0, 0.0, 0.0)))),
                    locally_random=bool(ep.get("locally_random", False)),
                    randomize_inject_v=bool(ep.get("randomize_inject_v", False)),
                )
            )
            colliders.append(collider_params)
            inj_rand.append(rand_table)
            act_ranges.append(None)  # filled in build() from particle pool

        collector = None
        if "collector_boundary" in params:
            collector = CollectorCfg(
                boundary=create_boundary(**params["collector_boundary"]),
                mat_filter=defaults.pop("collector_mat", None),
            )
        else:
            defaults.pop("collector_mat", None)

        agent_cfg = AgentCfg(
            effectors=tuple(eff_cfgs),
            collide_type=defaults.get("collide_type", "particle"),
            collector=collector,
            inject_till=params.get("inject_till"),
            collide_y_gate=defaults.get("collide_y_gate"),
            action_effector=defaults.get("action_effector"),
            clip_action=defaults.get("clip_action"),
            clip_action_p=defaults.get("clip_action_p"),
        )
        return agent_cfg, tuple(colliders), tuple(inj_rand), tuple(act_ranges)

    def build(self):
        particles = self.bodies.get()
        n_particles = 0 if particles is None else len(particles["x"])
        self.particles = particles

        if self.boundary is None:
            self.boundary = create_boundary()

        agent_cfg, colliders, inj_rand, _ = self._build_agent()

        colliding = [s for s in self.statics if s.has_dynamics]
        has_rigid = particles is not None and bool(
            np.any(M.MAT_CLASS_TABLE[particles["mat"]] == M.MAT_RIGID)
        )
        # SVD elision for all-inviscid-liquid scenes.  The round-5 r1
        # finding (elided backward 1.4x SLOWER: 21.0 -> 30.1 ms/substep)
        # was the det/cbrt chain losing the SVD custom_vjp's residual/
        # fusion boundary; with elide_variant='sphvjp' (closed-form VJP
        # around J = c^3 det(I + dt C) and cbrt, core/mat3.py) the elided
        # fwd+bwd measures 13.0 vs 15.0 ms/substep for the SVD path @65k
        # (RESULTS.md r2), so elision is now default-ON when the scene
        # qualifies.  FL_SVD_ELIDE=0 forces the SVD path for sweeps.
        all_inviscid = (
            os.environ.get("FL_SVD_ELIDE", "1") == "1"
            and particles is not None
            and bool(
                np.all(M.MAT_CLASS_TABLE[particles["mat"]] == M.MAT_LIQUID)
                and np.all(M.MU_TABLE[particles["mat"]] == 0.0)
            )
        )

        # transfer-impl selection: the Pallas block-binned kernels with
        # persistent once-per-step binning are the TPU fast path
        # (~10-20x on the forward substep, see RESULTS.md); the XLA
        # scatter/gather path is the portable semantic reference.
        mode = self.transfer
        if mode == "auto":
            on_tpu = any(str(d).startswith("TPU") for d in jax.devices())
            mode = "regions" if (on_tpu and self.quality == 1) else "portable"
        if mode == "pallas" and n_particles > 0:
            # exact per-substep binning: the fastest measured TPU config
            # (RESULTS.md).  binning_mode='step' (persistent sorting)
            # currently regresses on TPU; revisit when fixed.
            impl_kwargs = dict(p2g_impl="pallas", g2p_impl="pallas")
        elif mode == "regions" and n_particles > 0:
            # region-space grid phase: the canonical grid never exists
            # (ops/regions_pallas.py)
            impl_kwargs = dict(p2g_impl="regions", g2p_impl="regions")
        else:
            impl_kwargs = {}

        self.cfg = SimCfg(
            n_particles=n_particles,
            n_bodies=0 if particles is None else particles["bodies"]["n"],
            n_statics=len(colliding),
            dim=self.dim,
            quality=self.quality,
            gravity=self.gravity,
            horizon=self.horizon,
            boundary=self.boundary,
            agent=agent_cfg,
            smoke=self.smoke_cfg,
            has_rigid_bodies=has_rigid,
            all_inviscid_liquid=all_inviscid,
            **impl_kwargs,
        )

        # ---- particle params + init state
        param_kwargs = {}
        if particles is not None:
            param_kwargs = particle_params_from_properties(
                particles["mat"], particles["rho"], particles["body_id"], self.cfg
            )

        # ---- statics precompute at MPM grid nodes
        if colliding:
            cell_pos = grid_cell_positions(self.cfg)
            sdf_list, nrm_list, fric = [], [], []
            for s in colliding:
                sdf_c, nrm_c = precompute_static_grid(
                    s.sdf_voxels, s.T_world_to_voxels, cell_pos
                )
                sdf_list.append(sdf_c)
                nrm_list.append(nrm_c)
                fric.append(s.friction)
            param_kwargs.update(
                statics_sdf=jnp.asarray(np.stack(sdf_list)),
                statics_normal=jnp.asarray(np.stack(nrm_list)),
                statics_friction=jnp.asarray(np.asarray(fric, np.float32)),
            )

        # ---- injector act ranges from the initially-unused pool
        act_ranges = []
        if agent_cfg is not None:
            unused_idx = (
                np.where(~particles["used"])[0].astype(np.int32)
                if particles is not None
                else np.zeros(0, np.int32)
            )
            for ecfg in agent_cfg.effectors:
                if ecfg.kind in ("injector", "ball_injector") and ecfg.flux > 0:
                    assert len(unused_idx) > 0, "injector needs a 'nowhere' pool"
                    act_ranges.append(jnp.asarray(unused_idx))
                else:
                    act_ranges.append(None)

        # ---- smoke free mask (statics never move -> build-time constant)
        smoke_free = None
        smoke_step_fn = None
        if self.smoke_cfg is not None:
            from fluidlab_tpu.engine.smoke import (
                compute_free_mask,
                make_smoke_step,
            )

            smoke_free = compute_free_mask(self.smoke_cfg, colliding)
            smoke_step_fn = make_smoke_step(self.cfg)

        self.params = SceneParams(
            colliders=colliders,
            inj_rand=inj_rand,
            inj_act_range=tuple(act_ranges),
            smoke_free=smoke_free,
            **param_kwargs,
        )

        # ---- initial state (SoA layout: vectors (3, N), matrices (9, N))
        p_state = None
        if particles is not None:
            x0 = particles["x"].astype(np.float32).T  # (3, N)
            F0 = np.zeros((9, n_particles), np.float32)
            F0[[0, 4, 8]] = 1.0
            p_state = ParticleState(
                x=jnp.asarray(x0),
                v=jnp.zeros((3, n_particles), jnp.float32),
                C=jnp.zeros((9, n_particles), jnp.float32),
                F=jnp.asarray(F0),
                used=jnp.asarray(particles["used"].astype(bool)),
            )
        effs = []
        if agent_cfg is not None:
            for ecfg in agent_cfg.effectors:
                q0 = euler_to_quat_np(ecfg.init_euler).astype(np.float32)
                effs.append(init_effector_state(ecfg.init_pos, q0))
        smoke_state = None
        if self.smoke_cfg is not None:
            from fluidlab_tpu.engine.smoke import init_smoke_state

            smoke_state = init_smoke_state(self.smoke_cfg)

        self.init_state = SimState(
            particles=p_state,
            effectors=tuple(effs),
            smoke=smoke_state,
            f_global=jnp.zeros((), jnp.int32),
        )

        self._smoke_step_fn = smoke_step_fn
        self._step_fn = jax.jit(make_step(self.cfg, smoke_step_fn))
        self.state = self.init_state
        self.t = 0

        if self.loss is not None:
            self.loss.build(self)
        if self.renderer is not None:
            self.renderer.build(self)
        self._built = True

    # --------------------------------------------------------------- runtime
    @property
    def action_dim(self):
        return 0 if self.cfg.agent is None else self.cfg.agent.action_dim

    def _auto_window(self):
        """Remat window for gradient rollouts.  The reference always uses
        its two-level window scheme (max_substeps_local,
        mpm_simulator.py:777-912) because Taichi's tape has no choice;
        here the window only trades HBM for a second forward recompute,
        so: single-level (store every step-boundary state, backward =
        1x recompute) whenever H x state fits a budget, else two-level
        with the memory-optimal sqrt(H) window.  FL_REMAT_BUDGET (bytes)
        overrides the 2 GB default; FL_REMAT_WINDOW forces a window."""
        import os as _os

        forced = _os.environ.get("FL_REMAT_WINDOW")
        if forced:
            w = int(forced)
            return None if w <= 0 else w
        n = max(self.cfg.n_particles, 1)
        state_bytes = n * 25 * 4  # x,v (3+3) + C,F (9+9) + used
        if self.cfg.smoke is not None:
            state_bytes += (self.cfg.smoke.res ** 3) * 5 * 4
        budget = float(_os.environ.get("FL_REMAT_BUDGET", 2e9))
        if self.horizon * state_bytes <= budget:
            return None  # single-level: per-step checkpoint only
        return max(2, int(np.sqrt(self.horizon)))

    def auto_seg_len(self, horizon=None):
        """Segment length for the host-segmented backward
        (engine/rollout.py make_segmented_fwd_bwd), or None for the
        monolithic jitted fwd+bwd.

        The round-2 worker fault on monolithic fwd+bwd was
        backward-residual HBM pressure; the interleaved-accumulator
        residual (ops/regions_pallas.py) fixed it — the old crash
        config (46k x 10 x 100) now runs monolithic at 9.95 s/iter vs
        12.92 segmented (RESULTS.md r3).  The budget below is anchored
        to that measured working point (x4 margin); far beyond it the
        limiter is the remote-compile tunnel's upload cap (HTTP 413 at
        the full LatteArt spec), not the TPU.  FL_SEGLEN forces a
        length (<=0 forces monolithic)."""
        import os as _os

        horizon = self.horizon if horizon is None else horizon
        forced = _os.environ.get("FL_SEGLEN")
        if forced is not None:
            L = int(forced)
            return None if L <= 0 else L
        on_tpu = any(str(d).startswith("TPU") for d in jax.devices())
        if not on_tpu:
            return None
        work = self.cfg.n_particles * self.cfg.n_substeps
        # anchored ~2x above the largest configuration measured safe
        # monolithic (46k x 10 x 100 ~ 4.6e7, RESULTS.md r3); the r2
        # worker fault reproduced only with agent/injection + live
        # gradient, so keep the margin tight until a bigger
        # agent+injector scene is validated near the bound
        if work * horizon <= 1e8:
            return None
        budget = 1e8
        l_max = max(1, min(horizon, int(budget / max(work, 1))))
        # SECOND bound: backward residuals accrue PER SUBSTEP (grid
        # regions + particle saves), so a low-N/high-H scene passes the
        # particle-work bound yet blows HBM — Pouring (10k x 20 x 1000)
        # picked L=500 -> 10,000 substeps of residuals and crashed the
        # TPU worker (r4b).  Cap substeps per segment near the
        # measured-safe points (1000 @46k monolithic r3, 500 @115k
        # LatteArt): 2000 by default, FL_SEG_SUBSTEPS overrides.
        s_cap = int(_os.environ.get("FL_SEG_SUBSTEPS", 2000))
        l_max = min(l_max, max(1, s_cap // max(self.cfg.n_substeps, 1)))
        for L in range(l_max, 0, -1):
            if horizon % L == 0:
                return L
        return 1

    def make_rollout_fn(self, with_loss=True, action_overlay=None,
                        window="auto"):
        loss_fn = self.loss.loss_fn if (with_loss and self.loss) else None
        if window == "auto":
            window = self._auto_window()
        elif window is None:
            window = self.window
        return make_rollout(
            self.cfg, loss_fn=loss_fn, smoke_step_fn=self._smoke_step_fn,
            window=window,
            action_overlay=action_overlay,
        )

    def step(self, action=None):
        """Interactive single control step (gym path)."""
        has_action = action is not None
        a = (
            jnp.asarray(np.asarray(action, dtype=np.float32))
            if has_action
            else jnp.zeros((max(self.action_dim, 1),), jnp.float32)
        )
        self.state = self._step_fn(
            self.state, self.params, a, jnp.asarray(has_action)
        )
        self.t += 1
        if self.loss is not None:
            aux = self.loss.loss_aux()
            aux_t = None if aux is None else jax.tree_util.tree_map(
                lambda arr: arr[self.t - 1], aux
            )
            self._last_loss = self.loss.loss_fn(self.state, self.params, aux_t)

    def apply_agent_action_p(self, action_p):
        self.state = self.state.replace(
            effectors=_apply_action_p(
                self.cfg,
                self.state.effectors,
                jnp.asarray(np.asarray(action_p, dtype=np.float32)),
            )
        )

    def get_step_loss(self):
        assert self.loss is not None
        return self.loss.get_step_loss(float(self._last_loss["step_loss"]))

    # state save/restore (reference taichi_env.py:191-215)
    def get_state(self):
        return {"state": self.state, "grad_enabled": False}

    def set_state(self, state, grad_enabled=False):
        self.state = state.replace(f_global=jnp.zeros((), jnp.int32))
        self.t = 0
        if self.loss is not None:
            self.loss.reset()

    def reset(self):
        self.set_state(self.init_state)

    def render(self, mode="human", tgt_particles=None):
        assert self.renderer is not None, "No renderer available."
        return self.renderer.render_frame(self, mode, tgt_particles)
