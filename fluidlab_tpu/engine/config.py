"""Static simulation configuration (hashable dataclasses).

These are the compile-time constants of the jitted step: grid resolution,
timestep, agent/effector structure, boundaries.  They are closed over by
the step functions, so every branch on them is resolved at trace time
(the TPU analogue of the reference's ``ti.static`` branches).

Array-valued scene data (per-particle properties, SDF voxels, injector
random offsets, ...) lives in :class:`SceneParams` (a pytree of device
arrays) — see ``engine/scene.py``.
"""

from __future__ import annotations

import dataclasses
from typing import Optional, Tuple, Union

from fluidlab_tpu.engine.boundaries import CubeBoundary, CylinderBoundary

Boundary = Union[CubeBoundary, CylinderBoundary]


@dataclasses.dataclass(frozen=True)
class ColliderCfg:
    """Static description of a dynamic (effector-attached) SDF collider
    (reference meshes/dynamic.py + mesh.py)."""

    friction: float = 0.0
    softness: float = 0.0
    has_dynamics: bool = True
    voxel_res: int = 128


@dataclasses.dataclass(frozen=True)
class EffectorCfg:
    """Static description of one effector (reference effectors/*.py)."""

    kind: str  # 'rigid' | 'injector' | 'ball_injector' | 'aircon'
    action_dim: int = 3
    action_scale_v: Tuple[float, ...] = (1.0, 1.0, 1.0)
    action_scale_p: Tuple[float, ...] = (1.0, 1.0, 1.0)
    init_pos: Tuple[float, float, float] = (0.5, 0.5, 0.5)
    init_euler: Tuple[float, float, float] = (0.0, 0.0, 0.0)
    boundary: Boundary = CubeBoundary()
    collider: Optional[ColliderCfg] = None
    # injector-specific (reference injector.py:12-35)
    flux: int = 0
    radius: float = 0.0
    inject_v: Tuple[float, float, float] = (0.0, 0.0, 0.0)
    inject_p: Tuple[float, float, float] = (0.0, 0.0, 0.0)
    locally_random: bool = False
    randomize_inject_v: bool = False


@dataclasses.dataclass(frozen=True)
class CollectorCfg:
    """Out-of-boundary particle collection (reference agent_pouring.py:30-42,
    agent_jetbot.py:31-40)."""

    boundary: Boundary
    mat_filter: Optional[int] = None  # JetBot collects WATER only


@dataclasses.dataclass(frozen=True)
class AgentCfg:
    """Static agent description (reference agents/*.py).  Behavior variants
    are expressed as data instead of subclasses."""

    effectors: Tuple[EffectorCfg, ...] = ()
    collide_type: Optional[str] = "particle"  # 'particle'|'grid'|'both'|None
    collector: Optional[CollectorCfg] = None
    inject_till: Optional[int] = None  # substeps; None = no time gate
    collide_y_gate: Optional[float] = None  # icecream: collide only above y
    action_effector: Optional[int] = None  # route full action to one effector
    clip_action: Optional[Tuple[float, float]] = None
    clip_action_p: Optional[Tuple[float, float]] = None

    @property
    def action_dims(self) -> Tuple[int, ...]:
        """Cumulative action offsets (reference agent.py:31-44)."""
        dims = [0]
        if self.action_effector is not None:
            return (0, self.effectors[self.action_effector].action_dim)
        for e in self.effectors:
            dims.append(dims[-1] + e.action_dim)
        return tuple(dims)

    @property
    def action_dim(self) -> int:
        return self.action_dims[-1]


@dataclasses.dataclass(frozen=True)
class SmokeCfg:
    """Static smoke-field description (reference smoke_field.py:14-34)."""

    res: int = 128
    dt: float = 0.03
    solver_iters: int = 500
    q_dim: int = 1
    decay: float = 0.99
    high_T: float = 1.0
    low_T: float = 0.0
    lower_y: int = 60
    higher_y: int = 68


@dataclasses.dataclass(frozen=True)
class SimCfg:
    """Full static simulator configuration (reference mpm_simulator.py:14-37
    + taichi_env.py:21-57)."""

    n_particles: int = 0
    n_bodies: int = 0
    n_statics: int = 0
    dim: int = 3
    quality: int = 1
    dt: float = 2e-4
    n_substeps: int = 10  # substeps per control step (control dt = 2 ms)
    gravity: Tuple[float, float, float] = (0.0, -10.0, 0.0)
    horizon: int = 100
    boundary: Boundary = CubeBoundary()
    agent: Optional[AgentCfg] = None
    smoke: Optional[SmokeCfg] = None
    has_rigid_bodies: bool = False
    # static scene summary: every particle is MAT_LIQUID with Lame mu=0
    # (e.g. LatteArt milk+coffee).  Lets the substep skip the 3x3 SVD at
    # trace time: the corotated stress term is identically zero, so only
    # J is needed — computed as det(F_tmp) — and F resets to cbrt(J) I.
    all_inviscid_liquid: bool = False
    # elision variant (engine/mpm.py): 'sphvjp' (default) = spherical-F
    # shortcut with a closed-form custom VJP around the det/cbrt chain
    # (core/mat3.py liquid_J_cbrt — without the boundary the XLA-AD
    # backward costs +9 ms/substep on v5e, RESULTS.md); 'sph' = same
    # math under XLA AD; 'ftmp' = keep the F_tmp matmul, skip only the
    # SVD.  A SimCfg field (not an env read) so jit retraces when it
    # changes (see ADVICE r1).
    elide_variant: str = "sphvjp"
    rand_cycle: int = 4096  # injector random-offset table length
    # 'regions' keeps the whole grid phase in block-region space (the
    # canonical (C, G^3) grid never exists, ops/regions_pallas.py) and
    # must be set on BOTH impls together.
    p2g_impl: str = "scatter"  # 'scatter' | 'sort' | 'pallas' | 'regions'
    g2p_impl: str = "gather"  # 'gather' | 'pallas' | 'regions'
    # 'substep': bin particles exactly, every substep.  'step': bin once
    # per control step, keep the state block-sorted across the substeps
    # (ops/binning.py; needs binning_margin >= max per-step drift cells)
    binning_mode: str = "substep"
    binning_margin: int = 0

    @property
    def n_grid(self) -> int:
        return int(64 * self.quality)

    @property
    def dx(self) -> float:
        return 1.0 / self.n_grid

    @property
    def inv_dx(self) -> float:
        return float(self.n_grid)

    @property
    def p_vol(self) -> float:
        return (self.dx * 0.5) ** 2  # (reference mpm_simulator.py:25)

    @property
    def has_particles(self) -> bool:
        return self.n_particles > 0
