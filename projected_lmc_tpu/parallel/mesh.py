"""Device-mesh construction and model sharding rules.

New capability relative to the reference (which is single-process,
single-device — SURVEY §2.4): multitask-GP-specific SPMD over a
``jax.sharding.Mesh`` with two axes:

  * ``latent`` — the q-batch of latent GPs (the projected model's independent
    n×n problems, or per-latent LMC kernels). Embarrassingly parallel: each
    device factorizes its own latents. The GP analog of tensor/model parallel.
  * ``data``   — rows of the training set. Kernel cross-matrices K_xz and label
    matrices shard by rows; SGPR Gram reductions (RᵀR, Rᵀy) become XLA
    reduce-scatter/psum over ICI automatically through pjit propagation. The GP
    analog of data parallel.

Parameters stay replicated; only latent-batched state and n-indexed buffers
shard. XLA inserts all collectives.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..module import Module


def make_mesh(n_devices: int = None, latent: int = None, data: int = None) -> Mesh:
    """Builds a ('data', 'latent') mesh. Axis sizes chosen automatically when
    not given: latent gets the largest power-of-2 divisor ≤ 2, rest to data."""
    devices = jax.devices()
    if n_devices is None:
        n_devices = len(devices)
    devices = devices[:n_devices]
    if latent is None and data is None:
        latent = 2 if n_devices % 2 == 0 else 1
        data = n_devices // latent
    elif latent is None:
        latent = n_devices // data
    elif data is None:
        data = n_devices // latent
    assert latent * data == n_devices, "mesh axes must multiply to n_devices"
    import numpy as np
    dev_array = np.asarray(devices).reshape(data, latent)
    return Mesh(dev_array, axis_names=("data", "latent"))


def _path_names(path):
    names = []
    for p in path:
        if isinstance(p, jax.tree_util.GetAttrKey):
            names.append(p.name)
        elif isinstance(p, jax.tree_util.DictKey):
            names.append(str(p.key))
    return names


def _spec_for(path, leaf, q, data_ax, latent_ax):
    """(PartitionSpec, rule-tag) for one leaf. Replication is always
    *correct* (pjit propagation still computes the right values) — the rule
    tags exist so :func:`sharding_report` and the sharding tests can catch
    leaves silently falling through to replication, which is a performance
    bug, not a correctness one."""
    if not hasattr(leaf, "ndim") or leaf.ndim == 0:
        return P(), "scalar"
    names = _path_names(path)
    if "train_x" in names or "train_y_tasks" in names:
        if leaf.shape[0] % data_ax == 0:
            return P("data", *([None] * (leaf.ndim - 1))), "data-rows"
        return P(), "data-rows-indivisible"
    latent_scopes = ("covar_module", "likelihood", "train_y", "var_mean",
                     "var_chol", "lmc_coeffs", "mean_module")
    if any(n in latent_scopes for n in names) and q is not None \
            and leaf.shape[0] == q and q % latent_ax == 0:
        if "train_y" in names and leaf.ndim == 2 and leaf.shape[1] % data_ax == 0:
            return P("latent", "data"), "latent-by-data"
        return P("latent", *([None] * (leaf.ndim - 1))), "latent-batch"
    return P(), "replicated"


def model_shardings(model, mesh: Mesh, n_latents: int = None):
    """Sharding pytree for a GP model:

      * train_x / train_y_tasks / inducing-data rows -> P('data', ...)
      * latent-batched leaves (leading dim == n_latents) inside kernel,
        likelihood, variational state, train_y -> P('latent', ...)
      * everything else replicated

    :func:`sharding_report` exposes the per-leaf decisions; the sharding
    test-suite pins the expected decision for every key leaf of each model
    family, so a mis-classified leaf fails a test instead of silently
    replicating.
    """
    q = n_latents if n_latents is not None else getattr(model, "n_latents",
                                                        getattr(model, "n_funcs", None))
    data_ax = mesh.shape["data"]
    latent_ax = mesh.shape["latent"]
    paths_leaves, _ = jax.tree_util.tree_flatten_with_path(model)
    return [NamedSharding(mesh, _spec_for(p, l, q, data_ax, latent_ax)[0])
            for p, l in paths_leaves]


def sharding_report(model, mesh: Mesh, n_latents: int = None):
    """Audit view of :func:`model_shardings`: ``{path: (spec, rule)}`` for
    every array leaf. Use to verify a new model class actually shards where
    intended (``'replicated'`` on a latent-batched or n-indexed leaf means a
    heuristic missed it)."""
    q = n_latents if n_latents is not None else getattr(model, "n_latents",
                                                        getattr(model, "n_funcs", None))
    data_ax = mesh.shape["data"]
    latent_ax = mesh.shape["latent"]
    paths_leaves, _ = jax.tree_util.tree_flatten_with_path(model)
    out = {}
    for p, l in paths_leaves:
        spec, rule = _spec_for(p, l, q, data_ax, latent_ax)
        out[".".join(_path_names(p))] = (spec, rule)
    return out


def shard_model(model, mesh: Mesh, n_latents: int = None):
    """device_put the model pytree according to :func:`model_shardings`.

    (Shardings are handled as a flat list aligned with tree_leaves — Module
    flattening is value-class-dependent, so a model-shaped tree of
    NamedShardings would not share the model's treedef.)"""
    shardings = model_shardings(model, mesh, n_latents)
    leaves, treedef = jax.tree_util.tree_flatten(model)
    new = [jax.device_put(l, s) for l, s in zip(leaves, shardings)]
    return jax.tree_util.tree_unflatten(treedef, new)


def replicate(tree, mesh: Mesh):
    rep = NamedSharding(mesh, P())
    return jax.tree_util.tree_map(lambda x: jax.device_put(x, rep), tree)
