"""Simulation-state checkpointing (save/load SimState pytrees).

Complements the per-iteration policy pkls (utils/logger.py): lets long
interactive sessions and MPC runs snapshot/restore full simulator state.
Uses flattened npz — no format dependencies, works for any SimState
structure.
"""

from __future__ import annotations

import numpy as np
import jax


def save_state(path: str, state) -> None:
    leaves, treedef = jax.tree_util.tree_flatten(state)
    arrays = {f"leaf_{i}": np.asarray(x) for i, x in enumerate(leaves)}
    np.savez_compressed(path, n_leaves=len(leaves), **arrays)


def load_state(path: str, like):
    """Load into the structure of ``like`` (a template SimState)."""
    data = np.load(path)
    n = int(data["n_leaves"])
    leaves = [data[f"leaf_{i}"] for i in range(n)]
    _, treedef = jax.tree_util.tree_flatten(like)
    import jax.numpy as jnp

    template_leaves = jax.tree_util.tree_leaves(like)
    converted = [
        jnp.asarray(leaf, dtype=t.dtype) for leaf, t in zip(leaves, template_leaves)
    ]
    return jax.tree_util.tree_unflatten(treedef, converted)
