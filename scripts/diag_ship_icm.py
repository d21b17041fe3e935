#!/usr/bin/env python
"""Ship-ICM calibration diagnosis (VERDICT r2 item 5): why does the ICM row
of results/realdata_study_ship.csv ship PVA 2.27 / alpha_CI 0.51 while
PLMC/oilmm sit at ~0.95?

Three numbered experiments on a CPU-fp64 ship subsample (n=600, m=100
inducing — the full config's exact code path at tractable dense-check size):

  1. PATH CORRECTNESS — the shipped SGPR posterior variance
     (ops/woodbury.lmc_sgpr_posterior: diag(U* Cap⁻¹ U*ᵀ) + Σt) vs the
     dense np×np fp64 ground truth of the SAME Nyström (DTC) model
     Σ = U Uᵀ + I⊗Σt. Identical ⇒ no variance bug.
  2. MODEL CLASS — the DTC model's variance vs the EXACT-K ICM posterior
     variance at the same hyperparameters. gpytorch's InducingPointKernel
     (the reference's ship config, projected_lmc.py:302-303 +
     realdata_experiments.py:398 n_ind_points=500) defines the model ON the
     Nyström kernel, whose posterior is classically overconfident: the
     discarded K−Q mass is unmodeled. The reference's own compute_var
     (projected_lmc.py:591-640) also evaluates covar_module.forward — the
     Nyström kernel — so this behavior is INHERITED, not introduced.
  3. CALIBRATION — PVA/alpha_CI of the trained subsample model under both
     variance definitions, against the held-out 100 ship rows.

Writes results/diag_ship_icm.json. Pure CPU (x64); ~15 min.
"""

import json
import os
import sys
import time

os.environ.setdefault("JAX_PLATFORMS", "cpu")
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main(n_sub=600, m_ind=100, n_iter=3000,
         out="results/diag_ship_icm.json"):
    import jax
    jax.config.update("jax_enable_x64", True)
    import jax.numpy as jnp
    from projected_lmc_tpu.experiments.realdata import load_ship
    from projected_lmc_tpu.experiments.driver import build_models, _loss_fn_for
    from projected_lmc_tpu.training import fit, lambda_lr_schedule

    data = load_ship()
    X, Y = data["X"][:n_sub], data["Y"][:n_sub]
    Xt, Yt = data["X_test"], data["Y_test"]
    T = Y.shape[1]

    models = build_models(X, Y, q_model=3, q_noise_guess=0,
                          models_to_run=["ICM"], kernel_type="matern",
                          mean_type="zero", n_ind_points=m_ind)
    model = models["ICM"]
    t0 = time.time()
    model, info = fit(model, _loss_fn_for("ICM", model), n_iter=n_iter,
                      lr=1e-2, schedule=lambda_lr_schedule(1e-2, 1e-3),
                      loss_thresh=1e-7, patience=500)
    train_s = time.time() - t0

    # shipped path
    pred = model.posterior(Xt, observed=True)
    mean_ship = np.asarray(pred.mean)
    var_ship = np.asarray(pred.variance)

    # 1. dense fp64 ground truth of the SAME Nyström model ----------------
    roots, H_eff, St_eff, _ = model._sgpr_structure(jnp.asarray(X))
    roots_t = model._nystrom_roots(jnp.asarray(Xt))
    B = np.asarray(model.task_covar_matrix(), np.float64)
    St = np.asarray(model.likelihood.task_covariance(), np.float64)
    R = np.asarray(roots[0], np.float64)                 # (n, m)
    Rt_ = np.asarray(roots_t[0], np.float64)             # (n*, m)
    Q = R @ R.T                                          # (n, n) Nyström
    Qs = Rt_ @ R.T                                       # (n*, n)
    Qss = Rt_ @ Rt_.T
    n, nst = Q.shape[0], Qss.shape[0]
    Sig = np.kron(Q, B) + np.kron(np.eye(n), St)         # (nT, nT)
    Cross = np.kron(Qs, B)
    yv = np.asarray(Y, np.float64).reshape(-1)           # vec, task-fastest
    alpha = np.linalg.solve(Sig, yv)
    mean_dense = (Cross @ alpha).reshape(nst, T)
    Cov_post = np.kron(Qss, B) - Cross @ np.linalg.solve(Sig, Cross.T)
    var_dense = np.diagonal(Cov_post).reshape(nst, T) \
        + np.diag(St)[None, :]
    path_mean_err = float(np.abs(mean_ship - mean_dense).max()
                          / (np.abs(mean_dense).max() + 1e-30))
    path_var_err = float(np.abs(var_ship - var_dense).max()
                         / (np.abs(var_dense).max() + 1e-30))

    # 2. exact-K ICM posterior variance at the SAME hyperparameters -------
    Kfull = np.asarray(model.covar_module(jnp.asarray(X)), np.float64)[0]
    Ks = np.asarray(model.covar_module(jnp.asarray(Xt), jnp.asarray(X)),
                    np.float64)[0]
    kss_diag = np.asarray(model.covar_module(jnp.asarray(Xt), diag=True),
                          np.float64)[0]
    SigK = np.kron(Kfull, B) + np.kron(np.eye(n), St)
    CrossK = np.kron(Ks, B)
    var_exactK = (kss_diag[:, None] * np.diag(B)[None, :]
                  - np.diagonal(CrossK @ np.linalg.solve(SigK, CrossK.T))
                  .reshape(nst, T) + np.diag(St)[None, :])
    mean_exactK = (CrossK @ np.linalg.solve(SigK, yv)).reshape(nst, T)

    def calib(mean, var):
        err = np.abs(Yt - mean)
        sig = np.sqrt(np.clip(var, 1e-12, None))
        return dict(
            R2=float(np.mean(1 - np.mean(err ** 2, 0) / np.var(Yt, 0))),
            PVA=float(np.mean(np.log(np.mean(err ** 2 / sig ** 2, 0)))),
            alpha_CI=float(np.mean(err < 2 * sig)),
            mean_sigma=float(sig.mean()))

    out_d = dict(
        config=dict(n_sub=n_sub, m_ind=m_ind, n_iter=info["n_iter"],
                    train_s=round(train_s, 1), loss=float(info["loss"])),
        experiment_1_path_correctness=dict(
            mean_rel_err=path_mean_err, var_rel_err=path_var_err,
            verdict=("shipped path == dense fp64 Nyström-model posterior"
                     if max(path_mean_err, path_var_err) < 1e-6 else
                     "MISMATCH — variance bug in the shipped path")),
        experiment_2_model_class=dict(
            mean_var_dtc=float(var_dense.mean()),
            mean_var_exactK=float(var_exactK.mean()),
            dtc_underestimates_by=float(var_exactK.mean()
                                        / var_dense.mean())),
        experiment_3_calibration=dict(
            shipped_dtc=calib(mean_dense, var_dense),
            exact_K_same_hypers=calib(mean_exactK, var_exactK)),
        note=("the reference's ship ICM (InducingPointKernel + compute_var, "
              "projected_lmc.py:302-303,591-640) evaluates the SAME Nyström "
              "kernel for both training and variance — the DTC "
              "overconfidence measured here is inherited behavior, not a "
              "rebuild bug, whenever experiment 1 shows parity"))
    os.makedirs(os.path.dirname(out) or ".", exist_ok=True)
    with open(out, "w") as f:
        json.dump(out_d, f, indent=1)
    print(json.dumps(out_d, indent=1))


if __name__ == "__main__":
    main()
