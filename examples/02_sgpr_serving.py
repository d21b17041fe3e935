"""Serving pattern: SGPR projected-LMC with an amortized prediction cache.

Large-n training data with m inducing points (the Titsias SGPR path of
projected_lmc.py:302-303), then low-latency batched prediction: the training
system is factorized ONCE by ``model.prediction_cache()`` (the functional
analog of gpytorch's prediction-strategy cache) and reused across serving
batches — per-batch work is only the n*×m cross-covariance and solves.
CPU-runnable:

    JAX_PLATFORMS=cpu python examples/02_sgpr_serving.py
"""
import os
import sys
import time

import numpy as np
import jax
import jax.numpy as jnp

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
import projected_lmc_tpu as pl
from projected_lmc_tpu.training import fit

rng = np.random.default_rng(0)
n, d, p, q, m = 4000, 4, 6, 3, 128
X = rng.standard_normal((n, d)).astype(np.float32)
F = np.stack([np.sin(X @ w) for w in rng.standard_normal((q, d))], axis=1)
H = rng.standard_normal((q, p)).astype(np.float32)
Y = (F @ H + 0.05 * rng.standard_normal((n, p))).astype(np.float32)

model = pl.ProjectedGPModel(X, Y, p, q, init_lmc_coeffs=True,
                            kernel_type="matern", BDN=True, scalar_B=True,
                            diagonal_B=True, n_inducing_points=m)
model, info = fit(model, pl.projected_lmc_mll, n_iter=400, lr=2e-2,
                  patience=100)
print(f"trained {info['n_iter']} iters, loss {info['loss']:.4f}")

# --- serving: factorize once, reuse per batch -------------------------------
cache = jax.jit(lambda mdl: mdl.prediction_cache())(model)
serve = jax.jit(lambda mdl, c, xs: mdl.predict(xs, observed=True, cache=c))

for batch in range(3):
    Xb = rng.standard_normal((256, d)).astype(np.float32)
    t0 = time.time()
    mean, var = serve(model, cache, jnp.asarray(Xb))
    jax.block_until_ready(mean)
    print(f"batch {batch}: mean {mean.shape}, var {var.shape}, "
          f"{(time.time() - t0) * 1e3:.1f} ms"
          + ("  (includes compile)" if batch == 0 else ""))

# the cache gives the same results as the self-contained path (up to fp32
# reduction-order noise across the differing jit programs)
mean0, var0 = model.predict(jnp.asarray(X[:64]), observed=True)
mean1, var1 = serve(model, cache, jnp.asarray(X[:64]))
print("cache == self-contained:",
      bool(np.allclose(np.asarray(mean0), np.asarray(mean1),
                       rtol=1e-4, atol=1e-4)))
