"""Checkpoint / resume: survive a preemption mid-training.

``fit(checkpoint_every=..., checkpoint_path=...)`` saves the in-training
model as a key-path-keyed .npz every N iterations; ``load_model`` restores
it into a structurally identical template (loud on any mismatch — leaves are
matched by pytree key path, never by position). A capability the reference
lacks (SURVEY §5: only incremental CSV result exports). CPU-runnable:

    JAX_PLATFORMS=cpu python examples/04_checkpoint_resume.py
"""
import os
import sys
import tempfile

import numpy as np
import jax.numpy as jnp

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
import projected_lmc_tpu as pl
from projected_lmc_tpu.training import fit
from projected_lmc_tpu.utils.checkpoint import load_model

rng = np.random.default_rng(0)
n, d, p, q = 200, 2, 5, 2
X = rng.standard_normal((n, d)).astype(np.float32)
F = np.stack([np.sin(X @ w) for w in rng.standard_normal((q, d))], axis=1)
H = rng.standard_normal((q, p)).astype(np.float32)
Y = (F @ H + 0.05 * rng.standard_normal((n, p))).astype(np.float32)

path = os.path.join(tempfile.mkdtemp(), "plmc_ckpt.npz")

# phase 1: train 300 iters, checkpointing every 100
model = pl.ProjectedGPModel(X, Y, p, q, init_lmc_coeffs=True,
                            kernel_type="matern", BDN=True, scalar_B=True)
model, info = fit(model, pl.projected_lmc_mll, n_iter=300, lr=2e-2,
                  patience=10_000, checkpoint_every=100,
                  checkpoint_path=path)
# info['loss'] is the last in-loop evaluation (pre-update); recompute on the
# returned (post-update) model for an exact comparison with the checkpoint
loss_after_300 = float(-pl.projected_lmc_mll(model))
print(f"phase 1: {info['n_iter']} iters, loss {loss_after_300:.5f}, "
      f"checkpoint at {path}")

# --- simulated preemption: a fresh process builds the SAME template and
# restores the learned state from disk ---------------------------------------
template = pl.ProjectedGPModel(X, Y, p, q, init_lmc_coeffs=True,
                               kernel_type="matern", BDN=True, scalar_B=True)
restored = load_model(template, path)
resumed_loss = float(-pl.projected_lmc_mll(restored))
print(f"restored: loss {resumed_loss:.5f} "
      f"(matches phase-1 final: {abs(resumed_loss - loss_after_300) < 1e-4})")

# phase 2: continue training from the restored state
restored, info2 = fit(restored, pl.projected_lmc_mll, n_iter=300, lr=5e-3,
                      patience=10_000)
print(f"phase 2: loss {info2['loss']:.5f} "
      f"(improved: {info2['loss'] <= resumed_loss + 1e-6})")

mean, _ = restored.predict(jnp.asarray(X))
rmse = float(np.sqrt(np.mean((np.asarray(mean) - F @ H) ** 2)))
print(f"rmse vs noiseless truth: {rmse:.4f}")
