"""Shared particle->block binning for the Pallas transfer kernels.

Both the binned P2G (ops/p2g_pallas.py) and the binned G2P
(ops/g2p_pallas.py) need the same CSR layout of particles grouped by
16^3-cell grid block.  Two TPU constraints shape it:

- **argsort is expensive** (~10 ms at 65k keys on v5e — XLA's bitonic
  sort is latency-bound in pass count, not bandwidth), so the binning is
  computed ONCE and shared by both kernels, and under the persistent
  mode (engine/mpm.py ``binning_mode='step'``) once per *control step*.
- **DMA row alignment**: the kernels stream (chunk, 128) row slabs
  between HBM and VMEM at per-block offsets.  f32 tiles are (8, 128),
  so every block's slot range must start at a multiple of 8 — the CSR is
  therefore *padded*: each block's extent is rounded up to ALIGN slots,
  the filler ("dummy") slots alias particle 0 and carry valid=0.

Total padded size NPAD = N + NB^3 * ALIGN is static (each block wastes
at most ALIGN-1 slots).  Dummy slots never contribute: P2G multiplies
weights (or features, via the used mask) by ``valid``; G2P output rows
for dummies are simply never read back (the id->slot map ``inv`` only
addresses real slots).
"""

from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp

import os as _os

BLOCK = 16   # cells per block edge
# slot alignment of block ranges = the kernels' chunk size (every block
# owns >= 1 chunk, so every managed out block is written; chunks never
# straddle blocks).  FL_ALIGN env: perf experiments only.
ALIGN = int(_os.environ.get("FL_ALIGN", "128"))


class Binning(NamedTuple):
    """Aligned padded CSR binning of particles into grid blocks."""

    order: jnp.ndarray   # (NPAD,) padded slot -> particle id (dummy -> 0)
    valid: jnp.ndarray   # (NPAD,) float32, 1.0 for real slots
    inv: jnp.ndarray     # (N,)    particle id -> padded slot
    starts: jnp.ndarray  # (NB^3 + 1,) padded slot ranges, ALIGN-multiples
    block: jnp.ndarray   # (3, N)  binning-time block coords, particle order


def padded_size(n: int, G: int) -> int:
    nb = G // BLOCK
    return ((n + ALIGN - 1) // ALIGN) * ALIGN + nb * nb * nb * ALIGN


_MODE = _os.environ.get("FL_BINNING", "count")  # 'count' | 'argsort'


_PREFIX_CHUNK = 256


def _prefix_inclusive(oh):
    """Inclusive prefix sum of a (N, K) 0/1 int32 lattice along axis 0.

    ``jnp.cumsum`` lowers to ~log2(N) full passes over the lattice
    (~0.5 GB of traffic at 65k x 64); instead do a two-level scan: a
    lower-triangular-ones matmul gives within-chunk prefixes on the MXU
    (operands are exactly representable in bf16, partial sums exact in
    the f32 accumulator — any MXU precision is exact), and a tiny
    cumsum over the per-chunk totals provides the chunk offsets.
    """
    import jax

    N, K = oh.shape
    CH = _PREFIX_CHUNK
    if N <= CH:
        return jnp.cumsum(oh, axis=0)
    npad = ((N + CH - 1) // CH) * CH
    ohp = jnp.pad(oh, ((0, npad - N), (0, 0)))
    blocks = ohp.reshape(-1, CH, K).astype(jnp.float32)
    tri = jnp.tril(jnp.ones((CH, CH), jnp.float32))
    within_chunk = jax.lax.dot_general(
        tri, blocks,
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )  # (CH, B, K): within_chunk[i, b, k] = sum_{j<=i} blocks[b, j, k]
    within_chunk = jnp.transpose(within_chunk, (1, 0, 2))
    tots = blocks.sum(axis=1)  # (B, K)
    offs = jnp.cumsum(tots, axis=0) - tots  # exclusive chunk offsets
    out = (within_chunk + offs[:, None, :]).reshape(npad, K)[:N]
    return out.astype(jnp.int32)


def compute_binning(base, G: int) -> Binning:
    """Bin particles by the block of their (clipped) base cell.

    ``base`` (3, N) int32 must already be clipped to [0, G-3] (the
    B-spline stencil clip), so block indices are in range by
    construction.

    Default strategy is a **counting sort**: block ids take only NB^3
    (= 64 at 64^3) values, so ranks come from a one-hot cumulative sum
    and the permutation from unique-index scatters — no argsort (XLA's
    bitonic sort costs ~10 ms per 65k keys on TPU, RESULTS.md).
    """
    N = base.shape[-1]
    nb = G // BLOCK
    nb3 = nb * nb * nb
    npad = padded_size(N, G)

    block = base // BLOCK  # (3, N)
    bid = (block[0] * nb + block[1]) * nb + block[2]

    if _MODE == "count":
        # Gather-free plan (profiled on v5e, RESULTS.md): the naive
        # take_along_axis(within, bid) costs 0.67 ms and the 64-entry
        # table gather pstart[bid] another 0.52 ms per call — both are
        # N-sized gathers that TPU serializes.  Instead every per-
        # particle lookup into a (nb3,)-table is a masked row-reduce
        # over the (N, nb3) one-hot lattice that already exists for the
        # counting sort, and order/valid come from ONE fused scatter.
        onehot = (
            bid[:, None] == jnp.arange(nb3, dtype=jnp.int32)[None, :]
        )  # (N, nb3) bool
        onehot_i = onehot.astype(jnp.int32)
        counts = jnp.sum(onehot_i, axis=0)
        within = _prefix_inclusive(onehot_i)  # inclusive prefix per block
        cpad = jnp.maximum((counts + ALIGN - 1) // ALIGN, 1) * ALIGN
        pstart = jnp.concatenate([
            jnp.zeros((1,), jnp.int32), jnp.cumsum(cpad).astype(jnp.int32)
        ])
        # inv[p] = pstart[bid[p]] + rank_in_block[p], as one select+sum
        # pass over the one-hot lattice (no gathers).
        inv = jnp.sum(
            jnp.where(onehot, within - 1 + pstart[None, :nb3], 0), axis=1
        )
        # order & valid from one unique-index scatter: ids+1 so that
        # untouched (dummy) slots read as invalid.
        order1 = jnp.zeros((npad,), jnp.int32).at[inv].set(
            jnp.arange(1, N + 1, dtype=jnp.int32), unique_indices=True,
            indices_are_sorted=False,
        )
        valid = (order1 > 0).astype(jnp.float32)
        order = jnp.maximum(order1 - 1, 0)
        return Binning(order=order, valid=valid, inv=inv, starts=pstart,
                       block=block)

    order0 = jnp.argsort(bid)   # rank -> id
    rank = jnp.argsort(order0)  # id -> rank
    sorted_bid = bid[order0]
    starts0 = jnp.searchsorted(
        sorted_bid, jnp.arange(nb3 + 1, dtype=jnp.int32)
    ).astype(jnp.int32)
    counts = starts0[1:] - starts0[:-1]  # (nb3,)
    # every block gets at least one chunk (its kernel out block must be
    # written even when empty — all-dummy chunks accumulate zero)
    cpad = jnp.maximum((counts + ALIGN - 1) // ALIGN, 1) * ALIGN
    pstart = jnp.concatenate([
        jnp.zeros((1,), jnp.int32), jnp.cumsum(cpad).astype(jnp.int32)
    ])  # (nb3 + 1,)

    # particle id -> padded slot: rank within block + block's pad offset
    inv = rank + (pstart[:-1] - starts0[:-1])[bid]

    # padded slot -> particle id
    s = jnp.arange(npad, dtype=jnp.int32)
    b_of_s = jnp.clip(
        jnp.searchsorted(pstart, s, side="right").astype(jnp.int32) - 1,
        0, nb3 - 1,
    )
    j = s - pstart[b_of_s]
    valid = j < counts[b_of_s]
    src_rank = jnp.clip(starts0[b_of_s] + j, 0, max(N - 1, 0))
    order = jnp.where(valid, order0[src_rank], 0)

    return Binning(
        order=order,
        valid=valid.astype(jnp.float32),
        inv=inv,
        starts=pstart,
        block=block,
    )


# How the kernels move per-particle rows between particle order and the
# padded slot order.  'gather' (default): rows[:, order] / res[inv] —
# plain XLA gathers.  'scatter': unique-index scatters by the inverse
# map — XLA lowers duplicate-free scatter-set without the sort, and TPU
# gathers at N-scale index sets are slow (RESULTS.md), so this can be
# the cheaper direction.  Numerically identical (dummy slots become
# zeros instead of aliasing particle 0; both are inert downstream).
_PACK_MODE = _os.environ.get("FL_PACK", "gather")


def pack_rows(rows, order, inv):
    """(R, N) particle-order rows -> (R, NPAD) padded slot order."""
    if _PACK_MODE == "scatter":
        npad = order.shape[0]
        out = jnp.zeros(rows.shape[:-1] + (npad,), rows.dtype)
        return out.at[..., inv].set(rows, unique_indices=True)
    return rows[..., order]


def unpack_rows(res, order, valid, inv):
    """(NPAD, C) slot-order rows -> (N, C) particle order (drops
    dummies)."""
    if _PACK_MODE == "scatter":
        n = inv.shape[0]
        npad = order.shape[0]
        # dummies -> per-slot distinct trash rows [n, n+npad): duplicate
        # indices under unique_indices=True are UB for XLA scatter-set,
        # so the trash region must keep the index set genuinely unique
        slot = jnp.arange(npad, dtype=order.dtype)
        idx = jnp.where(valid > 0.5, order, n + slot)
        out = jnp.zeros((n + npad,) + res.shape[1:], res.dtype)
        out = out.at[idx].set(res, unique_indices=True)
        return out[:n]
    return res[inv]


def unpack_cols(res, order, valid, inv):
    """(C, NPAD) slot-order columns -> (C, N) particle order (drops
    dummies) — the column-oriented twin of ``unpack_rows`` for the
    transposed kernels (FL_KORIENT=cols), which emit SoA rows
    directly."""
    if _PACK_MODE == "scatter":
        n = inv.shape[0]
        npad = order.shape[0]
        # dummies -> per-slot distinct trash cols (see unpack_rows)
        slot = jnp.arange(npad, dtype=order.dtype)
        idx = jnp.where(valid > 0.5, order, n + slot)
        out = jnp.zeros(res.shape[:-1] + (n + npad,), res.dtype)
        out = out.at[..., idx].set(res, unique_indices=True)
        return out[..., :n]
    return res[..., inv]


def pin_rowmajor(x):
    """Materialize ``x`` in the default (minor-dim-last) layout.

    The Pallas packs/unpacks transpose between the engine's SoA (C, N)
    rows and the kernels' (NPAD, 128) packed layout.  Under persistent
    binning (presorted=True) nothing sits between those transposes and
    the substep scan carry, so XLA layout assignment makes them "free"
    by flipping the whole carry to a dim-0-minor {0,1} layout — which
    re-tiles every (C, N) pointwise op in the substep at 42-128x lane
    padding (~30 ms/substep at 65k, RESULTS.md round-3 traces).  A
    reshape round-trip through 1D across an optimization barrier forces
    ONE materialized relayout copy here instead (1D arrays have a
    unique layout, and the barrier stops reshape-reshape folding), so
    the {0,1} preference cannot propagate past this point.
    """
    import jax

    flat = jax.lax.optimization_barrier(x.reshape(-1))
    return flat.reshape(x.shape)


def chunk_active(valid):
    """(NCH,) int32: 1 where the ALIGN-slot chunk holds >= 1 real
    particle.  All-dummy chunks (aligned-CSR padding + the static tail
    past ``starts[-1]``, ~6-11% of slots at 65k) contribute exact zeros
    to every chunked kernel; the kernels pl.when-skip their compute and
    write zero out rows."""
    nch = valid.shape[0] // ALIGN
    return (
        valid.reshape(nch, ALIGN).max(axis=1) > 0
    ).astype(jnp.int32)


def chunk_to_block(starts, npad: int):
    """(NCH,) int32: owning block of each ALIGN-slot chunk.  Chunks past
    ``starts[-1]`` (the static-padding tail) map to the last block; their
    slots are all dummies."""
    nb3 = starts.shape[0] - 1
    c = jnp.arange(npad // ALIGN, dtype=jnp.int32) * ALIGN
    b = jnp.searchsorted(starts, c, side="right").astype(jnp.int32) - 1
    return jnp.clip(b, 0, nb3 - 1)
