"""MLS-MPM substep and control step, TPU-first.

Functional re-design of the reference MPM pipeline (reference
fluidlab/fluidengine/simulators/mpm_simulator.py:515-533):

    advect_used -> process_unused -> agent_act -> compute_F_tmp -> svd ->
    p2g -> agent_move -> grid_op -> g2p -> advect(+rigid shape matching)

as one pure function ``substep(state, params) -> state``:

- the activation mask and "process unused" carries become ``where``
  lattices over dense particle arrays;
- Taichi's atomic P2G scatter becomes a pluggable deterministic transfer
  (ops/p2g.py: XLA scatter / sort / Pallas block kernel);
- grid_op is a dense masked update over grid nodes with *precomputed*
  static-collider SDF/normal grids;
- rigid shape matching (reference :449-505) is segment_sum + batched SVD;
- the whole substep is differentiable end-to-end; time-integration memory
  comes from ``lax.scan`` + ``jax.checkpoint`` (rollout.py).

Layout is SoA/component-major (core/mat3.py): positions/velocities
(3, N), matrices (9, N) row-major, grid (4, G^3) channel-major — the
particle/cell axis is always minor, so TPU (8, 128) tiling packs fully.
A trailing-(N, 3) layout costs 42x padded HBM traffic and was measured
~50 ms/substep at 65k particles; this layout is the difference between
that and real performance.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp

from fluidlab_tpu.config import materials as M
from fluidlab_tpu.core import quat as quat_ops
from fluidlab_tpu.core.bspline import STENCIL, base_and_fx_soa, quadratic_weights_soa
from fluidlab_tpu.core.mat3 import (
    det_soa,
    liquid_J_cbrt,
    diag_mm_soa,
    eye_soa,
    mm_nt_soa,
    mm_soa,
    mv_soa,
    outer_soa,
)
from fluidlab_tpu.core.svd3 import svd3_soa
from fluidlab_tpu.engine import sdf as sdf_ops
from fluidlab_tpu.engine.config import AgentCfg, SimCfg
from fluidlab_tpu.engine.scene import SceneParams
from fluidlab_tpu.engine.types import EffectorState, ParticleState, SimState

EPS = M.EPS  # 1e-12 (reference macros.py:213)

# agent-path formulation knobs (TPU crash bisection, RESULTS.md):
# FL_INJECT: 'cond' (lax.cond around the scatter-set) | 'mask'
#   (always-run, gate-blended) -- see _inject.
# FL_AGENT_COND: 'cond' (lax.cond around set_action / effector moves) |
#   'mask' (always-run, where-blended poses/velocities).
import os as _os

_INJECT_MODE = _os.environ.get("FL_INJECT", "cond")
_AGENT_COND_MODE = _os.environ.get("FL_AGENT_COND", "cond")
# FL_GRIDPHASE: 'merged' (single custom VJP over p2g->grid_op->g2p with
# the fused moment-backward kernel; default) | 'split' (separate
# p2g_regions / g2p_regions custom VJPs) -- regions impl only.
_GRIDPHASE = _os.environ.get("FL_GRIDPHASE", "merged")
# crash-bisection ablation: which injection writes run in the mask/
# customvjp modes (comma set of x,v,used,act; NOT semantics-preserving
# unless all four are on)
_INJECT_PARTS = set(
    _os.environ.get("FL_INJECT_PARTS", "x,v,used,act").split(",")
)


@jax.custom_vjp
def _inject_write(arr, idx, vals):
    """arr (C, N) <- vals (C, flux) at columns idx; explicit VJP so the
    backward is a plain gather + scatter-zero instead of whatever XLA
    derives for the scatter-set transpose (FL_INJECT=customvjp)."""
    return arr.at[:, idx].set(vals, unique_indices=True)


def _inject_write_fwd(arr, idx, vals):
    return _inject_write(arr, idx, vals), idx


def _inject_write_bwd(idx, ct):
    d_vals = ct[:, idx]
    d_arr = ct.at[:, idx].set(0.0, unique_indices=True)
    return d_arr, None, d_vals


_inject_write.defvjp(_inject_write_fwd, _inject_write_bwd)


def _blend_effectors(has_action, moved, effs):
    """where-blend per-effector states (cond-free alternative to
    lax.cond(has_action, ...) -- same semantics, no cond transpose)."""
    out = []
    for e, m_e in zip(effs, moved):
        kw = {}
        for f in ("pos", "quat", "v", "w", "s", "r"):
            a = getattr(m_e, f)
            b = getattr(e, f)
            if a is not b:
                kw[f] = jnp.where(has_action, a, b)
        out.append(e.replace(**kw) if kw else e)
    return tuple(out)


# --------------------------------------------------------------------------
# agent sub-behaviors (static structure from AgentCfg)
# --------------------------------------------------------------------------

def _agent_collide(
    cfg: SimCfg,
    params: SceneParams,
    pos,  # (3, M)
    vel,  # (3, M)
    effs: Tuple[EffectorState, ...],
    effs_next: Tuple[EffectorState, ...],
):
    """Collide query points against all dynamic effector meshes
    (reference agents' ``collide`` dispatch, e.g. agent_rigid.py:21-23,
    agent_icecreamdynamic.py:38-43)."""
    agent = cfg.agent
    for i, ecfg in enumerate(agent.effectors):
        if ecfg.collider is None or not ecfg.collider.has_dynamics:
            continue
        v_new = sdf_ops.dynamic_collide(
            params.colliders[i],
            ecfg.collider.friction,
            ecfg.collider.softness,
            pos,
            vel,
            effs[i].pos,
            effs[i].quat,
            effs_next[i].pos,
            effs_next[i].quat,
            cfg.dt,
        )
        if agent.collide_y_gate is not None:
            gate = pos[1] > agent.collide_y_gate
            vel = jnp.stack([
                jnp.where(gate, v_new[d], vel[d]) for d in range(3)
            ])
        else:
            vel = v_new
    return vel


def _move_effectors(cfg: SimCfg, effs: Tuple[EffectorState, ...]):
    """Integrate effector poses one substep (reference effector.py:157-161:
    pos[f+1] = boundary.impose_x(pos[f] + v[f]); quat[f+1] = qmul(w2quat(w),
    quat[f]))."""
    out = []
    for i, ecfg in enumerate(cfg.agent.effectors):
        e = effs[i]
        pos1 = ecfg.boundary.impose_x(e.pos + e.v)
        quat1 = quat_ops.qmul(quat_ops.w2quat(e.w), e.quat)
        out.append(e.replace(pos=pos1, quat=quat1))
    return tuple(out)


def _inject(
    cfg: SimCfg,
    params: SceneParams,
    i: int,
    eff: EffectorState,
    f_global,
    x_next,  # (3, N)
    v_next,  # (3, N)
    used_next,  # (N,)
    gate,
    slot_of_id=None,  # (N,) original particle id -> current state slot
    psum_axis=None,   # particle-shard mesh axis (parallel/spatial.py)
):
    """Spawn ``flux`` particles from the pre-generated offset table
    (reference injector.py:80-105, 240-256).  The tiny (flux, 3) blocks
    stay AoS; only the final scatter touches the SoA state."""
    ecfg = cfg.agent.effectors[i]
    flux = ecfg.flux
    act_range = params.inj_act_range[i]
    rand = params.inj_rand[i]  # (L, flux, 3)
    L = rand.shape[0]

    def source_vals(act_id, dtype):
        """(idx (flux,), xi (flux, 3), vi (flux, 3)) for this firing."""
        idx = jax.lax.dynamic_slice(act_range, (act_id,), (flux,))
        if slot_of_id is not None:  # state is block-sorted this step
            idx = slot_of_id[idx]
        rv = jax.lax.dynamic_index_in_dim(rand, f_global % L, keepdims=False)
        inject_v = jnp.asarray(ecfg.inject_v, dtype=dtype)
        if ecfg.kind == "ball_injector":
            xi = rv + eff.pos  # offsets pre-scaled to the ball
            vi = jnp.broadcast_to(inject_v, (flux, 3))
        else:
            offset = (rv * 2.0 - 1.0) * ecfg.radius
            inject_p = quat_ops.transform_by_quat(
                jnp.asarray(ecfg.inject_p, dtype=dtype), eff.quat
            )
            xi = offset + eff.pos + inject_p
            vdir = quat_ops.transform_by_quat(inject_v, eff.quat)
            if ecfg.randomize_inject_v:
                vi = vdir + (rv * 2.0 - 1.0) * jnp.linalg.norm(inject_v) * 2.0
            else:
                vi = jnp.broadcast_to(vdir, (flux, 3))
        return idx, xi, vi

    if psum_axis is not None:
        # Sharded particle pool: ``act_range`` holds GLOBAL slot ids and
        # each device owns the contiguous window [d*Nl, (d+1)*Nl).  The
        # dense one-hot compares the firing's global slots against the
        # local window's global ids — the write lands only on the owning
        # device, collective-free (the replicated act_id/gate keep every
        # device's counter in lockstep).
        x_n, v_n, used_n, act_id = x_next, v_next, used_next, eff.act_id
        idx, xi, vi = source_vals(act_id, x_n.dtype)
        Nl = x_n.shape[1]
        gslots = (
            jax.lax.axis_index(psum_axis).astype(idx.dtype) * Nl
            + jnp.arange(Nl, dtype=idx.dtype)
        )
        onehot = idx[:, None] == gslots[None, :]  # (flux, Nl)
        hit = jnp.any(onehot, axis=0) & gate
        sel = onehot.astype(x_n.dtype)
        vals_x = xi.T.astype(x_n.dtype) @ sel
        vals_v = vi.T.astype(x_n.dtype) @ sel
        x_n = jnp.where(hit[None, :], vals_x, x_n)
        v_n = jnp.where(hit[None, :], vals_v, v_n)
        used_n = used_n | hit
        act_id = act_id + flux * gate.astype(jnp.int32)
        return x_n, v_n, used_n, act_id

    def do_inject(ops):
        x_n, v_n, used_n, act_id = ops
        idx, xi, vi = source_vals(act_id, x_n.dtype)
        for d in range(3):
            x_n = x_n.at[d, idx].set(xi[:, d])
            v_n = v_n.at[d, idx].set(vi[:, d])
        used_n = used_n.at[idx].set(True)
        return x_n, v_n, used_n, act_id + flux

    if _INJECT_MODE in ("mask", "customvjp", "dense"):
        # cond-free form: always run the injection computation and blend
        # by the gate with tiny (flux,)-sized gathers of the old values.
        # Semantically identical to the lax.cond form; exists because
        # the cond+scatter transpose is implicated in a TPU worker
        # crash at large N x horizon (RESULTS.md round-2 bisection).
        x_n, v_n, used_n, act_id = x_next, v_next, used_next, eff.act_id
        idx, xi, vi = source_vals(act_id, x_n.dtype)
        if _INJECT_MODE == "dense":
            # Scatter-free injection: build a (flux, N) one-hot of the
            # target slots by broadcast compare, materialise the injected
            # columns with a (3, flux) @ (flux, N) matmul (MXU), and
            # where-blend.  No scatter and no N-sized gather anywhere —
            # sidesteps the TPU worker fault hit by the scatter-set
            # forms at large N x horizon (RESULTS.md round-2 bisection).
            N = x_n.shape[1]
            slots = jnp.arange(N, dtype=idx.dtype)
            onehot = (idx[:, None] == slots[None, :])  # (flux, N)
            hit = jnp.any(onehot, axis=0) & gate  # (N,)
            sel = onehot.astype(x_n.dtype)
            vals_x = xi.T.astype(x_n.dtype) @ sel  # (3, N)
            vals_v = vi.T.astype(x_n.dtype) @ sel
            if "x" in _INJECT_PARTS:
                x_n = jnp.where(hit[None, :], vals_x, x_n)
            if "v" in _INJECT_PARTS:
                v_n = jnp.where(hit[None, :], vals_v, v_n)
        elif _INJECT_MODE == "customvjp":
            x_cols = jnp.where(gate, xi.T, x_n[:, idx])  # (3, flux)
            v_cols = jnp.where(gate, vi.T, v_n[:, idx])
            if "x" in _INJECT_PARTS:
                x_n = _inject_write(x_n, idx, x_cols)
            if "v" in _INJECT_PARTS:
                v_n = _inject_write(v_n, idx, v_cols)
        else:
            for d in range(3):
                if "x" in _INJECT_PARTS:
                    x_n = x_n.at[d, idx].set(
                        jnp.where(gate, xi[:, d], x_n[d, idx])
                    )
                if "v" in _INJECT_PARTS:
                    v_n = v_n.at[d, idx].set(
                        jnp.where(gate, vi[:, d], v_n[d, idx])
                    )
        if "used" in _INJECT_PARTS:
            if _INJECT_MODE == "dense":
                used_n = used_n | hit
            else:
                used_n = used_n.at[idx].set(gate | used_n[idx])
        if "act" in _INJECT_PARTS:
            act_id = act_id + flux * gate.astype(jnp.int32)
        return x_n, v_n, used_n, act_id

    return jax.lax.cond(
        gate, do_inject, lambda ops: ops, (x_next, v_next, used_next, eff.act_id)
    )


# --------------------------------------------------------------------------
# the substep
# --------------------------------------------------------------------------

def make_substep(cfg: SimCfg, psum_axis=None):
    """Build the jittable ``substep(state, params, has_action) -> state``.

    ``psum_axis``: name of a mesh axis the *particle axis* is sharded
    over (spatial domain decomposition, parallel/spatial.py).  When set,
    the substep runs on a local particle shard and inserts the two
    cross-device reductions MLS-MPM needs: an all-reduce of the P2G grid
    (one ``psum`` of the (4, G^3) momentum/mass grid per substep) and of
    the rigid-body shape-matching moment sums.  Everything else —
    grid_op, G2P, advection, effector kinematics — is local/replicated.
    """
    G = cfg.n_grid
    G3 = G * G * G
    dt = cfg.dt
    dx = cfg.dx
    inv_dx = cfg.inv_dx
    p_vol = cfg.p_vol
    gravity = cfg.gravity
    agent = cfg.agent
    stencil = [tuple(int(v) for v in o) for o in STENCIL]

    from fluidlab_tpu.ops.binning import compute_binning
    from fluidlab_tpu.ops.p2g import get_p2g

    use_regions = cfg.p2g_impl == "regions"
    if use_regions != (cfg.g2p_impl == "regions"):
        raise ValueError(
            "p2g_impl='regions' and g2p_impl='regions' must be set together"
            " (the grid phase never materializes the canonical grid)"
        )
    if psum_axis is not None:
        if use_regions and _GRIDPHASE != "merged":
            raise ValueError(
                "spatial sharding of the regions path is implemented for "
                "the fused grid phase only (FL_GRIDPHASE=merged, the "
                "default) — the split p2g/g2p regions cores have no "
                "all-reduce hook"
            )
        if cfg.binning_mode == "step":
            raise ValueError(
                "spatial sharding needs binning_mode='substep' (the "
                "persistent block-sorted layout would need a sharded "
                "slot_of_id map)"
            )
    _p2g = None if use_regions else get_p2g(cfg.p2g_impl)
    use_pallas_p2g = cfg.p2g_impl == "pallas"
    use_pallas_g2p = cfg.g2p_impl == "pallas"
    need_binning = use_pallas_p2g or use_pallas_g2p or use_regions
    marg = cfg.binning_margin

    # perf-bisection knobs (debug only): comma list in FL_ABLATE
    import os as _os

    _ablate = set(
        filter(None, _os.environ.get("FL_ABLATE", "").split(","))
    )

    def _cell_pos():
        ii = jax.lax.broadcasted_iota(jnp.int32, (G, G, G), 0)
        jj = jax.lax.broadcasted_iota(jnp.int32, (G, G, G), 1)
        kk = jax.lax.broadcasted_iota(jnp.int32, (G, G, G), 2)
        return jnp.stack([
            ii.reshape(G3), jj.reshape(G3), kk.reshape(G3)
        ]).astype(jnp.float32) * dx  # (3, G^3)

    def _region_cell_pos():
        """World positions of region cells, (3, NB^3, r2, RCOLS) in the
        block-region layout of ops/regions_pallas.py (region of block b
        covers global cells [b*BLOCK - m, b*BLOCK - m + region))."""
        from fluidlab_tpu.ops.binning import BLOCK
        from fluidlab_tpu.ops.p2g_pallas import _region
        from fluidlab_tpu.ops.regions_pallas import RCOLS

        nb = G // BLOCK
        nb3 = nb * nb * nb
        region = _region(marg)
        r2 = region * region
        bidx = jnp.arange(nb3, dtype=jnp.int32)
        borig = jnp.stack([
            bidx // (nb * nb), (bidx // nb) % nb, bidx % nb
        ]).astype(jnp.float32) * BLOCK - marg  # (3, NB^3)
        row = jax.lax.broadcasted_iota(jnp.int32, (1, r2, RCOLS), 1)
        zc = jax.lax.broadcasted_iota(jnp.int32, (1, r2, RCOLS), 2)
        a = (row // region).astype(jnp.float32)
        b = (row % region).astype(jnp.float32)
        z = zc.astype(jnp.float32)
        return jnp.stack([
            (borig[0][:, None, None] + a) * dx,
            (borig[1][:, None, None] + b) * dx,
            (borig[2][:, None, None] + z) * dx,
        ])

    def substep(state: SimState, params: SceneParams, has_action,
                binning=None, presorted: bool = False,
                slot_of_id=None, statics_regions=None) -> SimState:
        ps = state.particles
        effs = state.effectors
        x, v, C, F, used = ps.x, ps.v, ps.C, ps.F, ps.used
        N = x.shape[-1]

        # ---- collector: deactivate out-of-boundary particles in the
        # *current* frame too, so they skip this whole substep (reference
        # agent_pouring.py:30-42 — the f-mutation is load-bearing)
        collect = None
        if agent is not None and agent.collector is not None:
            out = agent.collector.boundary.is_out(x)
            if agent.collector.mat_filter is not None:
                out = out & (params.p_mat == agent.collector.mat_filter)
            collect = used & out
            used = used & ~out

        usedf = used.astype(x.dtype)

        # ---- F_tmp = (I + dt C) F and its SVD (reference :254-264)
        I9 = eye_soa(N, x.dtype)
        if cfg.all_inviscid_liquid:
            # every particle is mu=0 liquid (static scene fact): the
            # corotated term 2 mu (F-R) F^T is identically zero, so the
            # SVD is skipped at trace time — stress needs only
            # J = sigma0 sigma1 sigma2 = det(F_tmp) (svd3_soa keeps
            # rotations proper, so the product is the signed det), and
            # the liquid F-update resets to cbrt(J) I.  Further, liquid
            # F is always spherical (c I: initialized to I and reset to
            # cbrt(J) I every substep), so F_tmp = c (I + dt C) never
            # materializes: J = c^3 det(I + dt C) reads one F row and
            # skips the 3x3 matmul (and its residual) entirely.
            cbrtJ = None
            if cfg.elide_variant == "ftmp":
                # bisection variant: keep the 3x3 F_tmp matmul (and its
                # (9, N) residual) but skip the SVD — J via direct det.
                F_tmp_e = mm_soa(I9 + dt * C, F)
                J = det_soa(F_tmp_e)
            elif cfg.elide_variant == "sphvjp":
                # closed-form custom VJP around the det/cbrt chain: the
                # XLA-AD version costs +9 ms/substep in the backward on
                # v5e (RESULTS.md r5/r6 — the removed SVD custom_vjp was
                # acting as a residual/fusion boundary).
                J, cbrtJ = liquid_J_cbrt(F[0], C, dt)
                cbrtJ = jnp.where(used, cbrtJ, 1.0)
            else:
                c3 = F[0] * F[0] * F[0]
                J = c3 * det_soa(I9 + dt * C)
            J = jnp.where(used, J, 1.0)
            vol_term = (
                -dt * p_vol * 4.0 * inv_dx * inv_dx
            ) * (params.p_lam * J * (J - 1.0))
            stress = jnp.zeros_like(C)
            for d in (0, 4, 8):
                stress = stress.at[d].set(vol_term)
            affine = stress + params.p_mass[None, :] * C
            if cbrtJ is None:
                cbrtJ = jnp.cbrt(J)
            F_next = jnp.where(
                used[None, :], I9 * cbrtJ[None, :], F
            )
        else:
            F_tmp = mm_soa(I9 + dt * C, F)
            F_tmp = jnp.where(used[None, :], F_tmp, I9)
            if "nosvd" in _ablate:
                U, V = I9, I9
                sig = jnp.ones((3, N), x.dtype)
            else:
                U, sig, V = svd3_soa(F_tmp)

            # ---- stress (corotated + volumetric, reference p2g :339-344)
            J = sig[0] * sig[1] * sig[2]
            R = mm_nt_soa(U, V)  # U V^T
            stress = 2.0 * params.p_mu[None, :] * mm_nt_soa(F_tmp - R, F_tmp)
            vol_term = params.p_lam * J * (J - 1.0)
            for d in (0, 4, 8):
                stress = stress.at[d].add(vol_term)
            stress = (-dt * p_vol * 4.0 * inv_dx * inv_dx) * stress
            affine = stress + params.p_mass[None, :] * C

            # ---- deformation-gradient update by material class (:355-378)
            cbrtJ = jnp.cbrt(J)
            F_liquid = I9 * cbrtJ[None, :]
            sig_clamped = jnp.clip(sig, 1.0 - 2e-3, 1.0 + 3e-3)
            F_plastic = diag_mm_soa(U, sig_clamped, V)
            cls = params.p_mat_cls
            is_liquid = (cls == M.MAT_LIQUID)[None, :]
            is_plastic = (
                (cls == M.MAT_PLASTO_ELASTIC)
                | (cls == M.MAT_PLASTO_ELASTIC_DEMO)
            )[None, :]
            F_new = jnp.where(
                is_liquid, F_liquid, jnp.where(is_plastic, F_plastic, F_tmp)
            )
            F_next = jnp.where(used[None, :], F_new, F)

        # ---- P2G (ops/p2g.py; impl from cfg.p2g_impl)
        base, fx = base_and_fx_soa(x, inv_dx)
        base = jnp.clip(base, 0, G - 3)
        w = quadratic_weights_soa(fx)  # (3 off, 3 ax, N)
        if need_binning and binning is None:
            binning = compute_binning(base, G)
        gridreg = None
        if use_regions:
            from fluidlab_tpu.ops.regions_pallas import p2g_regions

            interp_r = not str(jax.devices()[0]).startswith("TPU")
            if _GRIDPHASE != "merged":
                gridreg = p2g_regions(
                    base, fx, usedf, params.p_mass, v, affine, G, dx,
                    binning, m=marg, presorted=presorted,
                    interpret=interp_r,
                )  # (NB^3, 4, r2, RCOLS), fully-summed (halos redundant)
        elif "nop2g" in _ablate:
            grid = jnp.ones((4, G3), x.dtype) * jnp.sum(affine) * 1e-20
        elif use_pallas_p2g:
            grid = _p2g(base, fx, w, usedf, params.p_mass, v, affine, G, dx,
                        binning=binning, m=marg, presorted=presorted)
        else:
            grid = _p2g(base, fx, w, usedf, params.p_mass, v, affine, G, dx)

        # ---- effector pose integration (before grid_op: collider velocity
        # needs pos[f] and pos[f+1]; reference substep order :515-533)
        if agent is not None and len(agent.effectors) > 0:
            if _AGENT_COND_MODE == "mask":
                effs_next = _blend_effectors(
                    has_action, _move_effectors(cfg, effs), effs
                )
            else:
                effs_next = jax.lax.cond(
                    has_action,
                    lambda es: _move_effectors(cfg, es),
                    lambda es: es,
                    effs,
                )
        else:
            effs_next = effs

        # ---- grid_op (reference :380-398).  In regions mode it runs
        # pointwise over the block-region layout (halo cells computed
        # redundantly; every copy of a global cell sees identical
        # inputs, so copies stay consistent) — the canonical (C, G^3)
        # grid never exists.  The regions grid_op is a closure so the
        # fused grid phase (make_grid_phase) can take its VJP with
        # jax.vjp inside the merged backward.
        def _gridop_regions(greg, vop):
            aux_ = None
            if len(vop) == 5:
                params_, effs_, effs_next_, statics_regions_, aux_ = vop
            else:
                params_, effs_, effs_next_, statics_regions_ = vop
            mass_g = greg[:, 3]  # (NB^3, r2, RCOLS)
            act_g = mass_g > EPS
            inv_m = 1.0 / jnp.maximum(mass_g, EPS)
            vo = jnp.stack([
                greg[:, d] * inv_m + dt * gravity[d] for d in range(3)
            ])  # (3, NB^3, r2, RCOLS)
            cpos = _region_cell_pos()
            if cfg.n_statics > 0:
                for si in range(cfg.n_statics):
                    sdf_r, normal_r = statics_regions_[si]
                    vo = sdf_ops.static_collide(
                        vo, sdf_r, normal_r, params_.statics_friction[si]
                    )
            if (agent is not None
                    and agent.collide_type in ("grid", "both")
                    and aux_ is not None):
                # precomputed-aux path: only the velocity blend runs
                # inside the (differentiated) grid op
                shp = vo.shape
                vf = vo.reshape(3, -1)
                for i, ecfg in enumerate(agent.effectors):
                    if aux_[i] is None:
                        continue
                    act_a, infl_a, nrm_a, cv_a = aux_[i]
                    v_new = sdf_ops.dynamic_collide_blend(
                        ecfg.collider.friction, act_a, infl_a, nrm_a,
                        cv_a, vf,
                    )
                    if agent.collide_y_gate is not None:
                        gate = cpos.reshape(3, -1)[1] > agent.collide_y_gate
                        vf = jnp.stack([
                            jnp.where(gate, v_new[d], vf[d])
                            for d in range(3)
                        ])
                    else:
                        vf = v_new
                vo = vf.reshape(shp)
            elif agent is not None and agent.collide_type in ("grid", "both"):
                effs_c, effs_nc = effs_, effs_next_
                if _os.environ.get("FL_COLLIDE_GRID_SG") == "1":
                    # Formulation decomposition (pouring dossier,
                    # RESULTS r5): the grid-site collide ADJOINT
                    # w.r.t. effector pose faults the TPU worker in
                    # every exact reformulation tried (split phase,
                    # host inverse, sticky, remat, matrix form), while
                    # the velocity path (same structure as
                    # static_collide's adjoint) is fine everywhere.
                    # Detach the pose inputs HERE ONLY: forward physics
                    # exact, d/d mat_v kept, pose cotangents still flow
                    # through the particle-site collide ('both' mode).
                    effs_c = jax.lax.stop_gradient(effs_)
                    effs_nc = jax.lax.stop_gradient(effs_next_)
                shp = vo.shape
                vo = _agent_collide(
                    cfg, params_, cpos.reshape(3, -1), vo.reshape(3, -1),
                    effs_c, effs_nc,
                ).reshape(shp)
            if agent is not None and _os.environ.get("FL_COLLIDE_DUMMY") == "1":
                # Diagnostic (pouring-fault dossier, RESULTS r5): an
                # epsilon-weighted effector-pose-dependent term with NO
                # collide math.  Discriminates "any differentiable
                # eff-dependence in the region gridop faults" (residual
                # layout/aliasing class) from "collide-specific".
                from fluidlab_tpu.core import quat as _quat_ops

                shp = vo.shape
                cpf = cpos.reshape(3, -1)
                rot = _quat_ops.transform_by_quat_soa(cpf, effs_[0].quat)
                vo = (vo.reshape(3, -1) + 1e-30 * (
                    rot + effs_[0].pos[:, None]
                )).reshape(shp)
            _, vo = cfg.boundary.impose_x_v(cpos, vo)
            vo = vo * act_g[None].astype(vo.dtype)
            return jnp.stack([vo[d] for d in range(3)], axis=1)

        if not use_regions:
            if psum_axis is not None:
                # spatial sharding: each device scattered only its local
                # particles — ONE all-reduce merges the momentum/mass
                # grid over ICI (4 * G^3 f32 = 4 MB at 64^3)
                grid = jax.lax.psum(grid, psum_axis)
            mass_g = grid[3]
            active = mass_g > EPS
            inv_mass = 1.0 / jnp.maximum(mass_g, EPS)
            v_out = jnp.stack([
                grid[d] * inv_mass + dt * gravity[d] for d in range(3)
            ])
            cell_pos = _cell_pos()
            if cfg.n_statics > 0:
                for si in range(cfg.n_statics):
                    v_out = sdf_ops.static_collide(
                        v_out,
                        params.statics_sdf[si],
                        params.statics_normal[si],
                        params.statics_friction[si],
                    )
            if agent is not None and agent.collide_type in ("grid", "both"):
                shp = v_out.shape
                v_out = _agent_collide(
                    cfg, params, cell_pos.reshape(3, -1),
                    v_out.reshape(3, -1), effs, effs_next,
                ).reshape(shp)
            _, v_out = cfg.boundary.impose_x_v(cell_pos, v_out)
            v_out = v_out * active[None].astype(x.dtype)

        # ---- G2P (:400-426).  TPU XLA gathers cost ~16 ms/substep at 65k
        # particles (27 separate or one fused 27N gather alike, measured),
        # so the TPU path uses the gather-free binned Pallas G2P
        # (ops/g2p_pallas.py); the portable gather path stays for CPU and
        # as the semantic reference.
        new_v = jnp.zeros_like(v)
        new_C = jnp.zeros_like(C)
        if use_regions:
            vop = (params, effs, effs_next, statics_regions)
            if (agent is not None
                    and agent.collide_type in ("grid", "both")
                    and _os.environ.get("FL_COLLIDE_GRID_PRECOMP") == "1"):
                # Precompute the pose-dependent collide auxiliaries
                # OUTSIDE the grid phase (RESULTS r5 pouring dossier:
                # any trilerp/where collide machinery inside the
                # recomputed gridop backward kernel-faults the worker;
                # the blend alone is safe).  stop_gradient: pose
                # cotangents via the grid site are dropped — they still
                # flow through the particle-site collide in 'both'
                # mode (documented deviation; forward physics exact).
                cpf = _region_cell_pos().reshape(3, -1)
                aux = []
                for i, ecfg in enumerate(agent.effectors):
                    if ecfg.collider is None or not ecfg.collider.has_dynamics:
                        aux.append(None)
                        continue
                    aux.append(jax.lax.stop_gradient(
                        sdf_ops.dynamic_collide_aux(
                            params.colliders[i], ecfg.collider.friction,
                            ecfg.collider.softness, cpf,
                            effs[i].pos, effs[i].quat,
                            effs_next[i].pos, effs_next[i].quat, cfg.dt,
                        )
                    ))
                vop = vop + (tuple(aux),)
            if _GRIDPHASE == "merged":
                from fluidlab_tpu.ops.regions_pallas import make_grid_phase

                # feats13 = [b | affine | mass] (ops/regions_pallas.py
                # p2g_regions feature prep)
                x_p = (base.astype(v.dtype) + fx) * dx
                Ax = mv_soa(affine, x_p)
                b3 = jnp.stack([
                    params.p_mass * v[i] - Ax[i] for i in range(3)
                ])
                feats13 = jnp.concatenate(
                    [b3, affine, params.p_mass[None, :]], axis=0
                ) * usedf[None, :]
                phase = make_grid_phase(
                    _gridop_regions, G, marg, presorted, interp_r,
                    psum_axis=psum_axis,
                )
                S0, S1g = phase(fx, base, feats13, vop, binning)
                new_v = S0
                xg = base.astype(S0.dtype) + fx
                new_C = (4.0 * inv_dx) * jnp.stack([
                    S1g[3 * i + d] - S0[i] * xg[d]
                    for i in range(3) for d in range(3)
                ])
            else:
                from fluidlab_tpu.ops.regions_pallas import g2p_regions

                vreg = _gridop_regions(gridreg, vop)
                new_v, new_C = g2p_regions(
                    base, fx, vreg, G, inv_dx, binning,
                    m=marg, presorted=presorted, interpret=interp_r,
                )
        elif "nog2p" in _ablate:
            new_v = v * 0.999 + jnp.sum(v_out) * 1e-20
            new_C = C * 0.999
        elif cfg.g2p_impl == "pallas":
            from fluidlab_tpu.ops.g2p_pallas import g2p_pallas

            interp = not str(jax.devices()[0]).startswith("TPU")
            new_v, new_C = g2p_pallas(
                base, fx, w, v_out, G, inv_dx, interpret=interp,
                binning=binning, m=marg, presorted=presorted,
            )
        else:
            for (oi, oj, ok) in stencil:
                wi = w[oi, 0] * w[oj, 1] * w[ok, 2]
                idx = (
                    (base[0] + oi) * (G * G) + (base[1] + oj) * G
                    + (base[2] + ok)
                )
                g_v = v_out[:, idx]  # (3, N)
                dpos = jnp.stack([oi - fx[0], oj - fx[1], ok - fx[2]])
                new_v = new_v + wi[None, :] * g_v
                new_C = new_C + (4.0 * inv_dx) * wi[None, :] * outer_soa(
                    g_v, dpos
                )
        if agent is not None and agent.collide_type in ("particle", "both"):
            x_tmp = x + dt * new_v
            new_v = _agent_collide(cfg, params, x_tmp, new_v, effs, effs_next)
        v_next = jnp.where(used[None, :], new_v, v)
        C_next = jnp.where(used[None, :], new_C, C)

        # ---- advect + rigid-body shape matching (:428-505)
        x_adv = x + dt * v_next
        if cfg.has_rigid_bodies:
            B = cfg.n_bodies
            rigid = ((params.p_mat_cls == M.MAT_RIGID) & used).astype(x.dtype)
            x1 = x + dt * v_next
            inv_n = 1.0 / jnp.maximum(params.body_n, 1.0)

            def seg(vals):  # (C, N) -> (C, B)
                s = jnp.stack([
                    jax.ops.segment_sum(
                        vals[c] * rigid, params.p_body, num_segments=B
                    )
                    for c in range(vals.shape[0])
                ])
                if psum_axis is not None:
                    # shape-matching moments sum over ALL of a body's
                    # particles, which span shards
                    s = jax.lax.psum(s, psum_axis)
                return s

            com0 = seg(x) * inv_n[None, :]
            com1 = seg(x1) * inv_n[None, :]
            d0 = x - com0[:, params.p_body]
            d1 = x1 - com1[:, params.p_body]
            H = seg(outer_soa(d0, d1))  # (9, B)
            Ub, sb, Vb = svd3_soa(H)
            Rb = mm_nt_soa(Vb, Ub)  # V U^T (reference :495)
            x_rigid = mv_soa(Rb[:, params.p_body], d0) + com1[:, params.p_body]
            is_r = rigid[None, :] > 0
            x_adv = jnp.where(is_r, x_rigid, x_adv)
        x_next = jnp.where(used[None, :], x_adv, x)

        used_next = used

        # ---- injection (reference agent_injector.py:31-35; the injected
        # particle first moves at substep f+1)
        if agent is not None:
            effs_out = list(effs_next)
            for i, ecfg in enumerate(agent.effectors):
                if ecfg.kind not in ("injector", "ball_injector") or ecfg.flux == 0:
                    continue
                gate = has_action
                if agent.inject_till is not None:
                    gate = gate & (state.f_global < agent.inject_till)
                x_next, v_next, used_next, new_act_id = _inject(
                    cfg, params, i, effs[i], state.f_global,
                    x_next, v_next, used_next, gate, slot_of_id,
                    psum_axis=psum_axis,
                )
                effs_out[i] = effs_out[i].replace(act_id=new_act_id)
            effs_next = tuple(effs_out)

        # ---- collector finalize: park collected particles at NOWHERE
        if collect is not None:
            nowhere = jnp.asarray(M.NOWHERE, dtype=x.dtype)
            x_next = jnp.stack([
                jnp.where(collect, nowhere[d], x_next[d]) for d in range(3)
            ])
            used_next = used_next & ~collect

        return state.replace(
            particles=ParticleState(
                x=x_next, v=v_next, C=C_next, F=F_next, used=used_next
            ),
            effectors=effs_next,
            f_global=state.f_global + 1,
        )

    return substep


# --------------------------------------------------------------------------
# the control step: action routing + smoke + n_substeps
# --------------------------------------------------------------------------

def set_action(cfg: SimCfg, effs: Tuple[EffectorState, ...], action):
    """Route an action vector to effector per-substep velocities
    (reference effector.py:252-268, aircon.py:202-215, agent.py:71-81)."""
    agent = cfg.agent
    n_sub = float(cfg.n_substeps)
    dims = agent.action_dims
    out = []
    for i, ecfg in enumerate(agent.effectors):
        e = effs[i]
        if agent.action_effector is not None and i != agent.action_effector:
            out.append(e)
            continue
        if agent.action_effector is not None:
            a = action
        else:
            a = action[dims[i]: dims[i + 1]]
        if ecfg.action_dim == 0:
            out.append(e)
            continue
        if agent.clip_action is not None:
            a = jnp.clip(a, *agent.clip_action)
        scale = jnp.asarray(ecfg.action_scale_v, dtype=a.dtype)
        a_s = a * scale
        v = a_s[:3] / n_sub
        w = e.w
        s, r = e.s, e.r
        if ecfg.action_dim > 3:
            w = a_s[3:6] / n_sub
        if ecfg.action_dim > 6:
            s = a_s[6]
            r = a_s[7]
        out.append(e.replace(v=v, w=w, s=s, r=r))
    return tuple(out)


def apply_action_p(cfg: SimCfg, effs: Tuple[EffectorState, ...], action_p):
    """Set initial effector positions from the position action (reference
    effector.py:223-231)."""
    agent = cfg.agent
    dims = agent.action_dims
    out = []
    for i, ecfg in enumerate(agent.effectors):
        e = effs[i]
        if agent.action_effector is not None and i != agent.action_effector:
            out.append(e)
            continue
        a = action_p if agent.action_effector is not None else action_p[
            dims[i]: dims[i + 1]
        ]
        if ecfg.action_dim == 0:
            out.append(e)
            continue
        if agent.clip_action_p is not None:
            a = jnp.clip(a, *agent.clip_action_p)
        scale = jnp.asarray(ecfg.action_scale_p, dtype=a.dtype)
        pos0 = ecfg.boundary.impose_x(a[:3] * scale[:3])
        out.append(e.replace(pos=pos0))
    return tuple(out)


# Slot permutation strategy for the persistent-binning path.  'scatter'
# (default): every direction is a unique-index scatter-set on the last
# axis — column *gathers* make XLA's layout assignment pick a
# dim-0-minor {0,1} layout for the whole scan carry, which re-tiles
# every (C, N) pointwise op at 42x lane padding (~30 ms/substep at 65k,
# RESULTS.md round-3 trace).  'gather' keeps the original forms.
_SORT_MODE = _os.environ.get("FL_SORT", "scatter")


def _scatter_cols(vals, idx, ncols: int):
    """(.., K) -> (.., ncols) unique-index scatter-set on the last axis
    (untouched columns zero)."""
    out = jnp.zeros(vals.shape[:-1] + (ncols,), vals.dtype)
    return out.at[..., idx].set(vals, unique_indices=True)


def _sort_cols(arr, order, inv, valid):
    """particle order -> padded slot order (non-custom-vjp form).
    scatter mode leaves dummy slots zero; gather mode aliases them to
    particle 0 — both are inert downstream (used=False, usedf=0)."""
    if _SORT_MODE == "scatter":
        return _scatter_cols(arr, inv, order.shape[0])
    return arr[..., order]


def _unsort_cols(arr, order, inv, valid):
    """padded slot order -> particle order (non-custom-vjp form)."""
    if _SORT_MODE == "scatter":
        n = inv.shape[0]
        idx = jnp.where(valid > 0.5, order, n)  # dummies -> trash col
        return _scatter_cols(arr, idx, n + 1)[..., :n]
    return arr[..., inv]


@jax.custom_vjp
def _sort_slots(arr, order, inv, valid):
    """(.., N) -> (.., NPAD): place particles into padded aligned slots.
    The VJP is the explicit inverse permutation instead of XLA's
    scatter-add transpose (which TPU lowers to a global sort);
    dummy-slot cotangents are identically zero because dummies are never
    read downstream."""
    return _sort_cols(arr, order, inv, valid)


def _sort_slots_fwd(arr, order, inv, valid):
    return _sort_cols(arr, order, inv, valid), (order, inv, valid)


def _sort_slots_bwd(res, ct):
    order, inv, valid = res
    if _SORT_MODE == "scatter":
        n = inv.shape[0]
        idx = jnp.where(valid > 0.5, order, n)
        d = _scatter_cols(ct, idx, n + 1)[..., :n]
    else:
        d = ct[..., inv]
    return d, None, None, None


_sort_slots.defvjp(_sort_slots_fwd, _sort_slots_bwd)


@jax.custom_vjp
def _unsort_slots(arr, order, inv, valid):
    """(.., NPAD) -> (.., N): read particles back out of their padded
    slots.  VJP is the explicit forward permutation (dummy slots zero)."""
    return _unsort_cols(arr, order, inv, valid)


def _unsort_slots_fwd(arr, order, inv, valid):
    return _unsort_cols(arr, order, inv, valid), (order, inv, valid)


def _unsort_slots_bwd(res, ct):
    order, inv, valid = res
    if _SORT_MODE == "scatter":
        d = _scatter_cols(ct, inv, order.shape[0])
    else:
        d = ct[..., order] * valid
    return d, None, None, None


_unsort_slots.defvjp(_unsort_slots_fwd, _unsort_slots_bwd)


def make_step(cfg: SimCfg, smoke_step_fn=None, psum_axis=None):
    """Build ``step(state, params, action, has_action) -> state``: one
    control step = action routing + optional smoke step + n_substeps
    (reference mpm_simulator.py:735-753).  ``psum_axis`` enables spatial
    particle sharding (see make_substep / parallel/spatial.py).

    With ``cfg.binning_mode == 'step'`` the particle state is permuted
    into block-sorted order ONCE here, the substeps run presorted (the
    Pallas transfer kernels skip their per-substep argsort + permutation
    gathers — the dominant TPU cost, see RESULTS.md), and the state is
    unsorted afterwards.  ``binning_margin`` cells of halo absorb the
    drift accumulated over the 10 substeps (particles past the margin
    drop out of the transfers — at margin 2 that needs a sustained
    velocity > 15 m/s at 64^3, far beyond any FluidLab task).
    """
    substep = make_substep(cfg, psum_axis=psum_axis)
    persistent = cfg.binning_mode == "step" and (
        cfg.p2g_impl in ("pallas", "regions")
        or cfg.g2p_impl in ("pallas", "regions")
    )
    use_regions = cfg.p2g_impl == "regions"

    def _statics_regions(params):
        """Static SDF/normal grids relaid into the block-region layout,
        once per control step (substeps share them)."""
        if not (use_regions and cfg.n_statics > 0):
            return None
        from fluidlab_tpu.ops.binning import BLOCK
        from fluidlab_tpu.ops.g2p_pallas import _build_regions

        nb = cfg.n_grid // BLOCK
        out = []
        for si in range(cfg.n_statics):
            sn = jnp.concatenate([
                params.statics_sdf[si][None], params.statics_normal[si]
            ], axis=0)
            r = _build_regions(sn, cfg.n_grid, nb, cfg.binning_margin)
            out.append((r[:, 0], jnp.stack([r[:, 1], r[:, 2], r[:, 3]])))
        return out
    if persistent and cfg.binning_margin < 1:
        raise ValueError(
            "binning_mode='step' needs binning_margin >= 1 to absorb "
            "within-step particle drift (margin m tolerates sustained "
            "speeds up to m*dx/(n_substeps*dt) — m=1 is ~7.8 m/s at "
            "64^3/dt=2e-4; particles past the margin drop out of the "
            "transfers for the rest of the step)"
        )

    from fluidlab_tpu.ops.binning import Binning, compute_binning

    def _predict_inject_bins(params, effs, x_bin, used):
        """Overwrite the binning positions of the particles that will be
        injected THIS step with their predicted spawn points.  The
        schedule is deterministic: act-pool slot ``act_id + k`` spawns at
        substep ``k // flux`` at the effector's (linearly advancing)
        position, so each one can be binned precisely — a single
        step-start prediction misses by many blocks when the injector
        sweeps fast (e.g. the LatteArt sine sweep)."""
        for i, e in enumerate(cfg.agent.effectors):
            if e.kind not in ("injector", "ball_injector") or e.flux == 0:
                continue
            eff = effs[i]
            W = e.flux * cfg.n_substeps
            idxw = jax.lax.dynamic_slice(
                params.inj_act_range[i], (eff.act_id,), (W,)
            )
            # slot act_id + k spawns at substep k // flux, at the
            # effector pose advanced that many times (_inject uses the
            # substep-entry effector state).  Replay the exact pose
            # kinematics (incl. boundary clamp and quat spin) — 10
            # iterations on (3,)-vectors, negligible.
            pos_j, quat_j = eff.pos, eff.quat
            spawn = []
            for _ in range(cfg.n_substeps):
                if e.kind == "ball_injector":
                    c = pos_j
                else:
                    c = pos_j + quat_ops.transform_by_quat(
                        jnp.asarray(e.inject_p, x_bin.dtype), quat_j
                    )
                spawn.append(c)
                pos_j = e.boundary.impose_x(pos_j + eff.v)
                quat_j = quat_ops.qmul(quat_ops.w2quat(eff.w), quat_j)
            spawn = jnp.stack(spawn, axis=1)  # (3, n_substeps)
            ks = jnp.arange(W, dtype=jnp.int32) // e.flux
            centers = spawn[:, ks]
            # pool-end clamp can alias already-used ids: keep their real x
            centers = jnp.where(used[idxw][None, :], x_bin[:, idxw], centers)
            x_bin = x_bin.at[:, idxw].set(centers)
        return x_bin

    def _substeps_sorted(state, params, has_action, statics_regions=None):
        ps = state.particles
        x, used = ps.x, ps.used
        G = cfg.n_grid

        x_bin = x
        if cfg.agent is not None:
            x_bin = _predict_inject_bins(params, state.effectors, x_bin, used)
        base_bin, _ = base_and_fx_soa(x_bin, cfg.inv_dx)
        base_bin = jnp.clip(base_bin, 0, G - 3)
        bn = compute_binning(base_bin, G)
        order, inv, valid = bn.order, bn.inv, bn.valid

        def sort_t(arr):
            return _sort_slots(arr, order, inv, valid)

        def unsort_t(arr):
            return _unsort_slots(arr, order, inv, valid)

        def sort_i(arr):  # non-diff int/bool rows (zeros at dummies)
            return _sort_cols(arr, order, inv, valid)

        state_s = state.replace(particles=ParticleState(
            x=sort_t(ps.x), v=sort_t(ps.v), C=sort_t(ps.C),
            F=sort_t(ps.F), used=sort_i(ps.used) & (valid > 0),
        ))
        import dataclasses as _dc

        params_s = _dc.replace(
            params,
            p_mu=sort_i(params.p_mu), p_lam=sort_i(params.p_lam),
            p_mass=sort_i(params.p_mass), p_mat=sort_i(params.p_mat),
            p_mat_cls=sort_i(params.p_mat_cls),
            p_body=sort_i(params.p_body),
        )
        bn_s = Binning(order=order, valid=valid, inv=inv,
                       starts=bn.starts, block=sort_i(bn.block))

        def body(s, _):
            return substep(s, params_s, has_action, binning=bn_s,
                           presorted=True, slot_of_id=inv,
                           statics_regions=statics_regions), None

        state_s, _ = jax.lax.scan(
            body, state_s, None, length=cfg.n_substeps
        )
        nps = state_s.particles
        return state_s.replace(particles=ParticleState(
            x=unsort_t(nps.x), v=unsort_t(nps.v), C=unsort_t(nps.C),
            F=unsort_t(nps.F), used=_unsort_cols(nps.used, order, inv, valid),
        ))

    def step(state: SimState, params: SceneParams, action, has_action):
        if cfg.agent is not None and cfg.agent.action_dim > 0:
            if _AGENT_COND_MODE == "mask":
                effs = _blend_effectors(
                    has_action,
                    set_action(cfg, state.effectors, action),
                    state.effectors,
                )
            else:
                effs = jax.lax.cond(
                    has_action,
                    lambda es: set_action(cfg, es, action),
                    lambda es: es,
                    state.effectors,
                )
            state = state.replace(effectors=effs)

        # smoke runs at step cadence, before the substeps (reference :745-747)
        if cfg.smoke is not None and smoke_step_fn is not None:
            state = smoke_step_fn(state, params)

        if cfg.has_particles or cfg.agent is not None:
            statics_regions = _statics_regions(params)
            if persistent and cfg.has_particles:
                state = _substeps_sorted(state, params, has_action,
                                         statics_regions)
            else:
                def body(s, _):
                    return substep(s, params, has_action,
                                   statics_regions=statics_regions), None

                state, _ = jax.lax.scan(
                    body, state, None, length=cfg.n_substeps
                )
        return state

    return step
