"""Spatial domain decomposition: ONE large scene sharded across chips.

The reference has no distributed layer at all (SURVEY.md §2.13 — single
CUDA device, taichi_env.py:12).  parallel/planner.py adds rollout data
parallelism (K independent rollouts, zero hot-loop traffic); this module
adds the orthogonal axis: scaling a SINGLE simulation past one chip's
HBM/FLOPs by sharding the *particle axis* over a ``'space'`` mesh axis.

Design (TPU-first, not a port):

- particles (and their static per-particle params) are sharded on their
  minor axis over ``'space'``; effector state / smoke grid / statics are
  replicated,
- each device runs P2G on its local particle shard into a full local
  (4, G^3) momentum/mass grid; ONE ``psum`` per substep all-reduces the
  grids over ICI (4 MB at 64^3 — a few microseconds of ICI time,
  amortized over the whole substep),
- grid_op runs replicated (pointwise, cheap), G2P/advection read the
  replicated grid and write only local particles — no gather traffic
  crosses chips,
- rigid-body shape matching all-reduces the per-body COM/covariance
  moment sums the same way (engine/mpm.py ``seg``),
- losses are local per-particle sums + one ``psum`` per step.

This is a *data decomposition by particle index*, not by space region:
MLS-MPM particles interact only through the grid, so correctness needs
no halo exchange at all — just the grid all-reduce — and no
re-partitioning as particles move.  The trade is that every device
holds the full G^3 grid; at 64^3–128^3 (the FluidLab regime) the grid
is ~1-8 MB vs ~50 MB/65k-particle state, so particles, not the grid,
are the memory/compute that needs sharding.

All agent kinds work sharded, including injectors: injection targets
global pool slots, and the sharded path compares the firing's global
slot ids against each device's contiguous window (engine/mpm.py
``_inject`` psum_axis branch) so the write lands only on the owning
device, collective-free.  The flagship ``regions`` grid phase shards
too: ONE psum of the interleaved block-region accumulator per substep
forward and one of the region cotangent in the backward
(ops/regions_pallas.py ``make_grid_phase(psum_axis=...)``).

Validated on an 8-virtual-device CPU mesh: forward and gradients match
the unsharded path to float tolerance (tests/test_spatial.py).
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, PartitionSpec as P

from fluidlab_tpu.engine.mpm import make_step


def make_space_mesh(n_devices: Optional[int] = None, devices=None) -> Mesh:
    """1-D mesh over the spatial (particle-shard) axis."""
    if devices is None:
        devices = jax.devices()
        if n_devices is not None:
            devices = devices[: n_devices]
    return Mesh(np.asarray(devices), ("space",))


def particle_specs(tree, n_particles: int, axis: str = "space"):
    """PartitionSpec tree: particle-axis leaves sharded over ``axis``,
    everything else replicated.

    Particle leaves are matched by *pytree path*, not just trailing
    dimension: fields of a ``particles`` subtree (ParticleState) and
    ``p_*`` SceneParams fields.  A leaf outside those whose trailing dim
    coincidentally equals ``n_particles`` (e.g. a G^3 grid at G^3 == N)
    raises instead of being silently sharded wrong.
    """

    def is_particle_path(path) -> bool:
        names = [
            getattr(k, "name", getattr(k, "key", None)) for k in path
        ]
        return any(
            n == "particles" or (isinstance(n, str) and n.startswith("p_"))
            for n in names
        )

    def spec(path, a):
        trailing_n = (
            hasattr(a, "ndim") and a.ndim >= 1
            and a.shape[-1] == n_particles
        )
        if is_particle_path(path):
            if not trailing_n:
                return P()  # e.g. scalar/per-body field inside the subtree
            return P(*([None] * (a.ndim - 1) + [axis]))
        if trailing_n:
            raise ValueError(
                f"ambiguous leaf at {jax.tree_util.keystr(path)}: trailing "
                f"dim equals n_particles={n_particles} but the path is not "
                f"a known particle field — extend particle_specs() for it"
            )
        return P()

    return jax.tree_util.tree_map_with_path(spec, tree)


def _check_divisible(cfg, mesh, axis):
    n_dev = mesh.shape[axis]
    if cfg.n_particles % n_dev:
        raise ValueError(
            f"n_particles={cfg.n_particles} must divide evenly over the "
            f"{n_dev}-device '{axis}' mesh axis (pad the particle pool)"
        )
    if cfg.p2g_impl in ("pallas", "regions") or cfg.g2p_impl in (
        "pallas", "regions"
    ):
        per_dev = cfg.n_particles // n_dev
        if per_dev % 128:
            raise ValueError(
                f"pallas/regions transfers need the per-device shard "
                f"({per_dev}) to be a multiple of the 128-slot binning "
                f"alignment"
            )


def make_spatial_step(cfg, mesh: Mesh, state, params, axis: str = "space",
                      smoke_step_fn=None, jit: bool = True):
    """Sharded ``step(state, params, action, has_action) -> state``.

    ``state``/``params`` are example pytrees (shapes only) used to derive
    the sharding spec trees; the particle axis of every (.., N) leaf is
    sharded over ``axis``, the rest replicated.
    """
    _check_divisible(cfg, mesh, axis)
    step = make_step(cfg, smoke_step_fn, psum_axis=axis)
    sspec = particle_specs(state, cfg.n_particles, axis)
    pspec = particle_specs(params, cfg.n_particles, axis)
    f = jax.shard_map(
        step, mesh=mesh,
        in_specs=(sspec, pspec, P(), P()),
        out_specs=sspec,
        check_vma=False,
    )
    return jax.jit(f) if jit else f


def make_spatial_rollout(cfg, mesh: Mesh, state, params,
                         per_particle_loss=None, axis: str = "space",
                         smoke_step_fn=None, window: int = 0,
                         jit: bool = True):
    """Sharded ``rollout(state0, params, actions) -> (stateH, loss)``.

    ``actions``: (H, A) (replicated).  ``per_particle_loss(state, params)
    -> (N_local,)`` is summed locally and ``psum``-reduced once per step;
    ``loss`` is the sum over steps.  ``window > 0`` remats each step
    (jax.checkpoint) to bound residual memory over long horizons.
    """
    _check_divisible(cfg, mesh, axis)
    step = make_step(cfg, smoke_step_fn, psum_axis=axis)

    def local_rollout(state0, params_, actions):
        def body(s, a):
            s = step(s, params_, a, jnp.asarray(True))
            if per_particle_loss is None:
                loss = jnp.zeros((), s.particles.x.dtype)
            else:
                loss = jax.lax.psum(
                    jnp.sum(per_particle_loss(s, params_)), axis
                )
            return s, loss

        body_fn = jax.checkpoint(body) if window else body
        sH, losses = jax.lax.scan(body_fn, state0, actions)
        return sH, jnp.sum(losses)

    sspec = particle_specs(state, cfg.n_particles, axis)
    pspec = particle_specs(params, cfg.n_particles, axis)
    f = jax.shard_map(
        local_rollout, mesh=mesh,
        in_specs=(sspec, pspec, P()),
        out_specs=(sspec, P()),
        check_vma=False,
    )
    return jax.jit(f) if jit else f
