"""Quickstart: train a Projected-LMC model on synthetic multitask data.

The 60-second tour of the library: generate q latent GPs mixed to p tasks
(the reference's experiments.py:136-170 setup), train the paper's projected
model with one jit-compiled step per iteration, and check calibration.
CPU-runnable:

    JAX_PLATFORMS=cpu python examples/01_quickstart_projected.py
"""
import os
import sys

import numpy as np
import jax.numpy as jnp

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
import projected_lmc_tpu as pl
from projected_lmc_tpu.training import fit
from projected_lmc_tpu.experiments.synthetic import generate_synthetic

data = generate_synthetic(n=300, p=12, q=3, q_noise=3, mu_noise=0.1,
                          mu_str=0.9, max_scale=0.5, n_test=400, seed=0)
X, Y, Xt, Yt = data["X"], data["Y"], data["X_test"], data["Y_test"]

model = pl.ProjectedGPModel(
    X, Y, n_tasks=Y.shape[1], n_latents=3, init_lmc_coeffs=True,
    kernel_type="matern", BDN=False, diagonal_B=False, scalar_B=False)

model, info = fit(model, pl.projected_lmc_mll, n_iter=2000, lr=1e-2,
                  patience=200, loss_thresh=2.5e-6)
print(f"trained {info['n_iter']} iters, final loss {info['loss']:.4f}")

mean, var = model.predict(jnp.asarray(Xt), observed=True)
metrics = pl.compute_metrics(
    Yt, np.asarray(mean), np.sqrt(np.asarray(var)), loss=info["loss"],
    H_guess_hid=np.zeros((1, Y.shape[1])), n_iter=info["n_iter"],
    train_time=info.get("train_time", 0.0), pred_time=0.0,
    print_metrics=False)
print(f"R2={metrics['R2']:.3f}  RMSE={metrics['RMSE']:.3f}  "
      f"alpha_CI={metrics['alpha_CI']:.3f} (target ~0.95)  "
      f"PVA={metrics['PVA']:.2f} (optimum 0)")

# model introspection (projected_lmc.py parity surface)
print("latent noises:", np.asarray(model.projected_noise()).round(4))
print("lengthscales:", np.asarray(model.lscales()).round(3))
