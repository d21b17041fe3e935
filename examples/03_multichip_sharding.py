"""Multi-chip SPMD training over a ('data', 'latent') mesh.

The scaling story the reference doesn't have: latent GPs batch-shard across
the 'latent' axis (tensor-parallel-like), kernel rows and labels shard across
'data'; XLA inserts the ICI collectives. This demo runs on a VIRTUAL 8-device
CPU mesh so it works anywhere; on a real TPU pod slice, drop the XLA_FLAGS
override and the same code spans the chips:

    XLA_FLAGS=--xla_force_host_platform_device_count=8 JAX_PLATFORMS=cpu \
        python examples/03_multichip_sharding.py
"""
import os
import sys

if "host_platform_device_count" not in os.environ.get("XLA_FLAGS", ""):
    os.environ["XLA_FLAGS"] = (os.environ.get("XLA_FLAGS", "")
                               + " --xla_force_host_platform_device_count=8")
os.environ.setdefault("JAX_PLATFORMS", "cpu")

import numpy as np
import jax
import jax.numpy as jnp
import optax

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
import projected_lmc_tpu as pl
from projected_lmc_tpu.module import trainable_mask, partition, combine
from projected_lmc_tpu.parallel.mesh import make_mesh, shard_model

rng = np.random.default_rng(0)
n, d, p, q = 512, 3, 8, 2
X = rng.standard_normal((n, d)).astype(np.float32)
Y = rng.standard_normal((n, p)).astype(np.float32)

mesh = make_mesh(data=4, latent=2)
print("mesh:", dict(mesh.shape), "devices:", len(jax.devices()))

model = pl.ProjectedGPModel(X, Y, p, q, init_lmc_coeffs=True,
                            kernel_type="matern", BDN=True, scalar_B=True,
                            diagonal_B=True)
model = shard_model(model, mesh)          # annotate leaves with NamedShardings

mask = trainable_mask(model)
params, static = partition(model, mask)
tx = optax.adamw(1e-2)
opt_state = tx.init(params)


@jax.jit
def step(params, opt_state):
    def neg_mll(pp):
        return -pl.projected_lmc_mll(combine(pp, static))
    loss, grads = jax.value_and_grad(neg_mll)(params)
    updates, opt_state = tx.update(grads, opt_state, params)
    return optax.apply_updates(params, updates), opt_state, loss


for i in range(20):
    params, opt_state, loss = step(params, opt_state)
print(f"20 sharded steps done, loss {float(loss):.4f}")

# sharded == unsharded (up to reduction order)
model_ref = pl.ProjectedGPModel(X, Y, p, q, init_lmc_coeffs=True,
                                kernel_type="matern", BDN=True, scalar_B=True,
                                diagonal_B=True)
l0 = float(pl.projected_lmc_mll(model_ref))
l1 = float(pl.projected_lmc_mll(shard_model(model_ref, mesh)))
print(f"unsharded MLL {l0:.6f}  sharded MLL {l1:.6f}  "
      f"match: {abs(l0 - l1) < 1e-4}")
