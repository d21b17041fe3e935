"""Lightweight pytree module system for TPU-native GP models.

The reference library (projectedlmc/projected_lmc.py) builds on torch.nn.Module with
mutable parameters/buffers and ``torch.nn.utils.parametrize`` hooks. The JAX rebuild
replaces that with immutable-ish pytree modules: every ``Module`` instance is a pytree
whose array-valued attributes are leaves, so whole models can be passed through
``jax.jit`` / ``jax.grad`` / ``optax`` directly.

Flattening rule (deterministic by attribute name):
  * dynamic (pytree children): jax/np arrays, ``Module`` instances, lists, dicts
  * static (aux data): python scalars, strings, None, tuples, callables, dtypes

Convention: configuration that must be hashable/static under ``jit`` is stored as
tuples or scalars; learnable parameters and data are arrays. Attributes named in
``_buffers_`` stay pytree leaves (they move with the model through jit) but are
excluded from the trainable mask used by the optimizer — the analog of
``register_buffer`` in the reference (e.g. projected_lmc.py:925 ``train_y``).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np


@jax.tree_util.register_pytree_node_class
class _Removed:
    """Placeholder for a partitioned-out leaf: flattens to an *empty* pytree
    (so jit/grad/optax skip it) while still classifying as dynamic, keeping the
    enclosing Module's treedef identical across partition round-trips."""

    def tree_flatten(self):
        return (), None

    @classmethod
    def tree_unflatten(cls, aux, children):
        return REMOVED

    def __repr__(self):
        return "--"


REMOVED = _Removed()


def _is_dynamic(value) -> bool:
    if isinstance(value, (jax.Array, np.ndarray, Module, list, dict, _Removed)):
        return True
    return False


class Module:
    """Base class: subclasses are automatically registered as pytrees."""

    _buffers_: tuple = ()        # attribute names excluded from training
    _frozen_params_: tuple = ()  # attribute names frozen on demand (requires_grad=False analog)

    def __init_subclass__(cls, **kwargs):
        super().__init_subclass__(**kwargs)
        jax.tree_util.register_pytree_with_keys(
            cls, cls._tree_flatten_with_keys, cls._tree_unflatten,
            flatten_func=cls._tree_flatten,
        )

    # -- pytree protocol ---------------------------------------------------
    def _partition_attrs(self):
        dyn_names, dyn_vals, static_items = [], [], []
        for name in sorted(self.__dict__.keys()):
            value = self.__dict__[name]
            if _is_dynamic(value):
                dyn_names.append(name)
                dyn_vals.append(value)
            else:
                static_items.append((name, value))
        return dyn_names, dyn_vals, static_items

    def _tree_flatten(self):
        dyn_names, dyn_vals, static_items = self._partition_attrs()
        return dyn_vals, (tuple(dyn_names), tuple(static_items))

    def _tree_flatten_with_keys(self):
        dyn_names, dyn_vals, static_items = self._partition_attrs()
        keyed = [(jax.tree_util.GetAttrKey(n), v) for n, v in zip(dyn_names, dyn_vals)]
        return keyed, (tuple(dyn_names), tuple(static_items))

    @classmethod
    def _tree_unflatten(cls, aux, children):
        dyn_names, static_items = aux
        obj = object.__new__(cls)
        for name, value in zip(dyn_names, children):
            object.__setattr__(obj, name, value)
        for name, value in static_items:
            object.__setattr__(obj, name, value)
        return obj

    # -- conveniences --------------------------------------------------------
    def replace(self, **updates) -> "Module":
        """Functional update: returns a copy with the given attributes replaced."""
        obj = object.__new__(type(self))
        obj.__dict__.update(self.__dict__)
        for k, v in updates.items():
            if k not in self.__dict__:
                raise AttributeError(f"{type(self).__name__} has no attribute {k!r}")
            obj.__dict__[k] = v
        return obj

    def astype(self, dtype) -> "Module":
        """Cast all inexact array leaves to ``dtype``."""
        def cast(x):
            if hasattr(x, "dtype") and jnp.issubdtype(x.dtype, jnp.inexact):
                return jnp.asarray(x, dtype)
            return x
        return jax.tree_util.tree_map(cast, self)

    def __repr__(self):
        dyn_names, _, static_items = self._partition_attrs()
        parts = [f"{n}=<dyn>" for n in dyn_names] + [f"{n}={v!r}" for n, v in static_items]
        return f"{type(self).__name__}({', '.join(parts)})"


# --------------------------------------------------------------------------
# Partition / combine (equinox-style filtering) for optimizers & jit.
# The non-selected side of a partition holds ``None`` at the removed leaf
# positions — jax treats None as an empty subtree, so both halves remain valid
# jit arguments; ``combine`` re-zips them with a None-aware tree_map.
# --------------------------------------------------------------------------

def trainable_mask(tree):
    """Flat list of bools aligned with ``jax.tree_util.tree_leaves(tree)``.

    A leaf is trainable unless (a) some enclosing Module lists its attribute
    name in ``_buffers_`` or ``_frozen_params_``, or (b) it is not an inexact
    (floating) array.
    """
    out = []

    def rec(node, frozen):
        if isinstance(node, Module):
            dyn_names, dyn_vals, _ = node._partition_attrs()
            for n, v in zip(dyn_names, dyn_vals):
                f = frozen or (n in node._buffers_) or (n in node._frozen_params_)
                rec(v, f)
        elif isinstance(node, (list, tuple)):
            for v in node:
                rec(v, frozen)
        elif isinstance(node, dict):
            for k in sorted(node.keys()):
                rec(node[k], frozen)
        elif node is None or isinstance(node, _Removed):
            pass  # empty subtree in jax flattening
        else:
            ok = (not frozen) and hasattr(node, "dtype") and \
                jnp.issubdtype(jnp.asarray(node).dtype, jnp.inexact)
            out.append(bool(ok))

    rec(tree, False)
    n_leaves = len(jax.tree_util.tree_leaves(tree))
    if len(out) != n_leaves:
        raise RuntimeError(
            f"mask misalignment: {len(out)} flags vs {n_leaves} leaves — "
            "a container holds a type the flatten rule does not cover")
    return out


def partition(tree, mask):
    """Split ``tree`` into (selected, rest) by a flat boolean mask
    (from :func:`trainable_mask`). Removed positions hold :data:`REMOVED`."""
    leaves, treedef = jax.tree_util.tree_flatten(tree)
    sel = jax.tree_util.tree_unflatten(
        treedef, [x if m else REMOVED for x, m in zip(leaves, mask)])
    rest = jax.tree_util.tree_unflatten(
        treedef, [REMOVED if m else x for x, m in zip(leaves, mask)])
    return sel, rest


def combine(a, b):
    """Inverse of :func:`partition`."""
    def pick(x, y):
        return y if isinstance(x, _Removed) else x
    return jax.tree_util.tree_map(pick, a, b,
                                  is_leaf=lambda x: isinstance(x, _Removed))


def map_static_attr(tree, name: str, value):
    """Return a copy of ``tree`` with every Module's STATIC attribute ``name``
    (where present) replaced by ``value``.

    Static attributes live in the pytree's aux data, so ``tree_map`` cannot
    touch them; this walks Module/list/dict containers and rebuilds. Used by
    e.g. :func:`training.fit_ensemble` to force ``use_pallas=False`` on every
    kernel before a vmapped train (Pallas grids are not vmap-batchable; at
    ensemble problem sizes the XLA build is the right choice anyway)."""
    def rec(node):
        if isinstance(node, Module):
            obj = object.__new__(type(node))
            obj.__dict__.update(node.__dict__)
            if name in obj.__dict__ and not _is_dynamic(obj.__dict__[name]):
                obj.__dict__[name] = value
            for k, v in list(obj.__dict__.items()):
                if isinstance(v, (Module, list, dict)):
                    obj.__dict__[k] = rec(v)
            return obj
        if isinstance(node, list):
            return [rec(v) for v in node]
        if isinstance(node, dict):
            return {k: rec(v) for k, v in node.items()}
        return node

    return rec(tree)


@jax.tree_util.register_static
class CacheTag(str):
    """Static string tag inside posterior-cache pytrees.

    Prediction caches (ExactGPModel.precompute_posterior and friends) are
    plain dicts of arrays plus a ``kind`` discriminator; registering the tag
    as a static pytree node lets a cache cross ``jax.jit`` boundaries as an
    argument — the serving pattern ``jit(lambda model, cache, x: ...)``."""
    __slots__ = ()
