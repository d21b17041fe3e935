"""Sharded training steps: full AdamW update jitted over a device mesh.

The step is the same pure function as training.fit's — pjit + the sharding
annotations from mesh.model_shardings are the only additions. XLA propagates
the latent/data shardings through the batched Cholesky and the SGPR Gram
reductions and inserts the ICI collectives itself.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import optax

from ..module import trainable_mask, partition, combine
from .mesh import model_shardings, shard_model


def sharded_fit_step(model, mesh, loss_fn=None, lr: float = 1e-2,
                     weight_decay: float = 1e-2):
    """Returns (step, params, opt_state, static) where ``step`` is a jitted
    sharded AdamW update: step(params, opt_state, static) -> (params', opt', loss)."""
    if loss_fn is None:
        loss_fn = lambda m: m.mll()
    model = shard_model(model, mesh)
    mask = trainable_mask(model)
    params, static = partition(model, mask)
    tx = optax.adamw(lr, weight_decay=weight_decay)
    opt_state = jax.jit(tx.init)(params)

    @jax.jit
    def step(params, opt_state, static):
        def neg_loss(p):
            return -loss_fn(combine(p, static))
        loss, grads = jax.value_and_grad(neg_loss)(params)
        updates, opt_state = tx.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return params, opt_state, loss

    return step, params, opt_state, static


def dryrun_step(model, mesh, loss_fn=None):
    """Compile + execute ONE sharded training step; returns the scalar loss.
    Used by __graft_entry__.dryrun_multichip to validate the multi-chip path."""
    step, params, opt_state, static = sharded_fit_step(model, mesh, loss_fn)
    params, opt_state, loss = step(params, opt_state, static)
    jax.block_until_ready(loss)
    return float(loss)
