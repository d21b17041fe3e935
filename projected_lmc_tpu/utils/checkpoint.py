"""Model checkpoint / resume.

The reference has no training checkpointing (SURVEY §5 — only incremental CSV
result exports). This adds the standard capability: a model pytree serializes
to a single .npz (leaves) + the treedef rebuilt from a reference instance, or
via orbax for sharded/async checkpoints when available.
"""

from __future__ import annotations

import os

import jax
import numpy as np


def save_model(model, path: str):
    """Save all array leaves of a model pytree to ``path`` (.npz)."""
    leaves = jax.tree_util.tree_leaves(model)
    arrays = {f"leaf_{i}": np.asarray(l) for i, l in enumerate(leaves)}
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    np.savez(path, **arrays)


def load_model(template, path: str):
    """Load leaves saved by :func:`save_model` into a structurally identical
    ``template`` model (same constructor arguments)."""
    import jax.numpy as jnp
    data = np.load(path if path.endswith(".npz") else path + ".npz")
    leaves, treedef = jax.tree_util.tree_flatten(template)
    if len(data.files) != len(leaves):
        raise ValueError(
            f"checkpoint has {len(data.files)} leaves, template has {len(leaves)}")
    new = [jnp.asarray(data[f"leaf_{i}"]) for i in range(len(leaves))]
    return jax.tree_util.tree_unflatten(treedef, new)


def save_orbax(model, path: str):
    """Orbax checkpoint (async/sharded-capable) when orbax is available."""
    import orbax.checkpoint as ocp
    ckptr = ocp.StandardCheckpointer()
    leaves = jax.tree_util.tree_leaves(model)
    ckptr.save(os.path.abspath(path), {f"leaf_{i}": l for i, l in enumerate(leaves)})
    ckptr.wait_until_finished()


def load_orbax(template, path: str):
    import jax.numpy as jnp
    import orbax.checkpoint as ocp
    ckptr = ocp.StandardCheckpointer()
    leaves, treedef = jax.tree_util.tree_flatten(template)
    target = {f"leaf_{i}": np.asarray(l) for i, l in enumerate(leaves)}
    restored = ckptr.restore(os.path.abspath(path), target)
    new = [jnp.asarray(restored[f"leaf_{i}"]) for i in range(len(leaves))]
    return jax.tree_util.tree_unflatten(treedef, new)
