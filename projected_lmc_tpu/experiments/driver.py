"""Parametric-study driver — the rebuild of experiments.py:119-380.

Builds the five reference model variants (ICM / var / PLMC / oilmm /
PLMC_fast, experiments.py:183-216 + realdata_experiments.py:99-118), trains
each with the shared jit loop (AdamW + LambdaLR + plateau stop), predicts,
computes the 15-metric dict, and accumulates CSV results with incremental
export at run landmarks 1, 10, 20, … (experiments.py:71,367-380).
"""

from __future__ import annotations

import os
import sys
import time

import numpy as np

from ..likelihoods import MultitaskGaussianLikelihood
from ..models import (MultitaskGPModel, VariationalMultitaskGPModel,
                      ProjectedGPModel)
from ..mlls import projected_lmc_mll
from ..training import fit, lambda_lr_schedule
from ..metrics import compute_metrics
from .synthetic import generate_synthetic

DEFAULT_PARAMS = {  # experiments.py:16-27
    "n": 500, "p": 100, "q": 25, "q_guess": 25, "q_noise": 25,
    "q_noise_guess": 25, "mu_noise": 1e-1, "mu_str": 0.9,
    "max_scale": 0.5, "void": 0.0,
}

DEFAULT_SWEEPS = {  # experiments.py:29-40
    "n": list(range(200, 1001, 100)),
    "p": list(range(50, 201, 25)),
    "q": list(range(10, 91, 10)),
    "q_guess": list(range(10, 91, 10)),
    "q_noise": list(range(10, 91, 10)),
    "q_noise_guess": list(range(10, 91, 10)),
    "mu_noise": list(np.logspace(-3, np.log10(0.5), 10)),
    "mu_str": list(np.linspace(1e-3, 1.0, 10)),
    "max_scales": list(np.linspace(0.1, 2.0, 10)),
    "void": [0.0],
}

MODEL_CONFIGS = {  # experiments.py:196-216, realdata_experiments.py:99-118
    "PLMC": dict(BDN=False, diagonal_B=False, scalar_B=False, diagonal_R=False),
    "oilmm": dict(BDN=True, diagonal_B=True, scalar_B=True, diagonal_R=True),
    "PLMC_fast": dict(BDN=True, diagonal_B=True, scalar_B=True, diagonal_R=False),
}


def _maybe_init_sm(model, X, Y, seed=0):
    """SpectralMixture kernels REQUIRE data-driven initialization before
    training (realdata_experiments.py:130-140 calls initialize_from_data;
    without it the mixture frequencies are arbitrary and the model collapses
    to mean prediction on periodic data like the tidal series)."""
    cm = getattr(model, "covar_module", None)
    if cm is not None and hasattr(cm, "initialize_from_data"):
        X, Y = np.asarray(X), np.asarray(Y)
        if hasattr(cm, "initialize_from_data_empspect"):
            # 1-D near-regular series: spectral-peak init (falls back to the
            # Unif-below-Nyquist heuristic internally when inapplicable)
            model = model.replace(
                covar_module=cm.initialize_from_data_empspect(X, Y, seed=seed))
        else:
            model = model.replace(
                covar_module=cm.initialize_from_data(X, Y, seed=seed))
    return model


def build_models(X, Y, q_model, q_noise_guess, models_to_run,
                 kernel_type="matern", mean_type="zero", decomp=None,
                 train_ind_ratio=1.5, n_ind_points=None, ker_kwargs=None,
                 oilmm_bulk=True, seed=0, var_ind_range=None):
    """Instantiate the reference's five model variants."""
    p = Y.shape[1]
    models = {}
    if "ICM" in models_to_run:
        lik = MultitaskGaussianLikelihood(num_tasks=p, rank=q_noise_guess, seed=seed)
        models["ICM"] = MultitaskGPModel(
            X, Y, lik, n_tasks=p, n_latents=q_model, model_type="ICM",
            init_lmc_coeffs=True, mean_type=mean_type, kernel_type=kernel_type,
            decomp=decomp, n_inducing_points=n_ind_points, ker_kwargs=ker_kwargs,
            seed=seed)
    if "var" in models_to_run:
        lik = MultitaskGaussianLikelihood(num_tasks=p, rank=q_noise_guess, seed=seed)
        TI_rat = train_ind_ratio if n_ind_points is None else X.shape[0] / n_ind_points
        models["var"] = VariationalMultitaskGPModel(
            X, n_latents=q_model, n_tasks=p, train_y=Y, init_lmc_coeffs=True,
            mean_type=mean_type, kernel_type=kernel_type, decomp=decomp,
            train_ind_ratio=TI_rat, seed=0, likelihood=lik,
            ker_kwargs=ker_kwargs, ind_point_range=var_ind_range)
    for name in ("PLMC", "oilmm", "PLMC_fast"):
        if name in models_to_run:
            cfg = dict(MODEL_CONFIGS[name])
            if name == "oilmm" and not oilmm_bulk:
                cfg["bulk"] = False
            models[name] = ProjectedGPModel(
                X, Y, p, q_model, proj_likelihood=None, init_lmc_coeffs=True,
                mean_type="zero", kernel_type=kernel_type, decomp=decomp,
                n_inducing_points=n_ind_points, ker_kwargs=ker_kwargs,
                seed=seed, **cfg)
    models = {k: _maybe_init_sm(m, X, Y, seed=seed) for k, m in models.items()}
    return models


def _loss_fn_for(name, model):
    if name in MODEL_CONFIGS:
        return projected_lmc_mll
    if name == "var":
        return lambda m: m.elbo()
    # MultitaskGPModel: thread the per-step PRNG key so the large-scale LMC
    # CG+SLQ path redraws its Hutchinson probes every iteration (ICM and the
    # dense LMC path ignore it).
    return lambda m, key: m.mll(key=key)


def train_and_eval(models, X_test, Y_test, n_iter=100000, lr=1e-2, lr_min=1e-3,
                   loss_thresh=2.5e-6, patience=500, criterion="max",
                   print_metrics=True, print_loss=False, test_mask=None,
                   block_every=1, scan_steps=None, var_fit="adam"):
    """Shared training + prediction + metrics (experiments.py:256-347).

    ``var_fit="warm_start"`` replaces ELBO gradient training of the
    variational model with the closed-form SGPR-optimal E-step
    (VariationalMultitaskGPModel.sgpr_warm_start) — the data-driven kernel
    initialization supplies the hyperparameters. On real data with
    spectral-mixture kernels this is the configuration that works: Adam
    ELBO training collapses from the whitened init (the ELBO is stationary
    in all interpolant-only parameters there) and the raw mixture
    bandwidths are too step-size-sensitive for scale-free optimizers — see
    results/var_tidal_collapse.md for the measured analysis.
    """
    results = {}
    trained = {}
    for name, model in models.items():
        if (var_fit in ("warm_start", "em") and name == "var"
                and hasattr(model, "sgpr_warm_start")):
            # "warm_start" = full closed-form coordinate ascent (E-steps on
            # q(u) + exact noise M-steps, VariationalMultitaskGPModel.sgpr_em)
            # — the E-step-only variant shipped σ at the init's noise guess
            # (round-3 tidal row: mean_sigma 1.20 vs RMSE 0.35, PVA −2.61)
            start = time.time()
            model_t = model.sgpr_em()
            info = dict(n_iter=0, train_time=time.time() - start,
                        losses=[], loss=float(-model_t.elbo()))
        else:
            loss_fn = _loss_fn_for(name, model)
            schedule = lambda_lr_schedule(lr_max=lr, lr_min=lr_min)
            model_t, info = fit(model, loss_fn, n_iter=n_iter, lr=lr,
                                schedule=schedule, loss_thresh=loss_thresh,
                                patience=patience, criterion=criterion,
                                print_loss=print_loss, block_every=block_every,
                                scan_steps=scan_steps)
        trained[name] = model_t
        results[name] = predict_and_metrics(
            name, model_t, info, X_test, Y_test,
            print_metrics=print_metrics, test_mask=test_mask)
    return results, trained


def predict_and_metrics(name, model_t, info, X_test, Y_test,
                        print_metrics=True, test_mask=None):
    """Prediction + the 15-metric block for one trained model
    (experiments.py:286-347) — the eval half of :func:`train_and_eval`,
    callable per-seed by the ensemble study runner."""
    start = time.time()
    if hasattr(model_t, "full_likelihood"):           # projected models
        mean, var = model_t.predict(X_test, observed=True)
        fl = model_t.full_likelihood()
        H_guess_hid = np.asarray(fl.task_noise_covar_factor)
    elif name == "ICM":
        cache = model_t.precompute_posterior()
        pred = model_t.posterior(X_test, cache=cache, observed=True)
        mean = pred.mean
        var = model_t.compute_var(X_test)             # reference uses compute_var
        lik = model_t.likelihood
        H_guess_hid = _noise_matrix(lik)
    else:
        pred = model_t(X_test, observed=True) if callable(model_t) else None
        mean, var = pred.mean, pred.variance
        H_guess_hid = _noise_matrix(model_t.likelihood)
    sigma = np.sqrt(np.asarray(var))
    pred_time = time.time() - start

    metrics = compute_metrics(Y_test, np.asarray(mean), sigma, info["loss"],
                              H_guess_hid, info["n_iter"], info["train_time"],
                              pred_time, print_metrics=print_metrics,
                              test_mask=test_mask)
    metrics["model"] = name
    return metrics


def _noise_matrix(lik):
    """Recover the estimated task-noise matrix H_guess_hid
    (experiments.py:333-340)."""
    global_noise = float(np.asarray(lik.noise)[0]) if lik.has_global_noise else 0.0
    if lik.rank > 0:
        H = np.asarray(lik.task_noise_covar_factor).copy()
        p = H.shape[0]
        H[range(p), range(p)] = np.diag(H) + global_noise
        return H
    return np.sqrt(np.asarray(lik.task_noises) + global_noise)


def run_study(v_test: str = "void", v_test_2: str = "void",
              n_random_runs: int = 1, models_to_run=None, params=None,
              sweeps=None, path: str = None, n_iter: int = 100000,
              lr: float = 1e-2, lr_min: float = 1e-3,
              loss_thresh: float = 2.5e-6, patience: int = 500,
              print_metrics: bool = False, export_results: bool = True,
              reject_nonconverged_runs: bool = False, block_every: int = 1,
              n_test: int = 2500, dtype=np.float32):
    """The full parametric study loop (experiments.py:119-380), with the same
    incremental landmark CSV export and optional non-converged-run rejection
    (err > max(0.2, 5·μ_noise), experiments.py:360-365)."""
    import pandas as pd

    v = dict(DEFAULT_PARAMS, **(params or {}))
    v_vals = dict(DEFAULT_SWEEPS, **(sweeps or {}))
    models_to_run = models_to_run or ["ICM", "PLMC", "oilmm", "var", "PLMC_fast"]
    landmarks = [1] + list(range(10, n_random_runs + 1, 10))
    if path is None:
        path = f"results/parameter_study_{v_test}_{v_test_2}.csv"
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)

    results = {}
    df = None
    df_conv = None
    n_success = None
    updated_cols = None
    for i_run in range(n_random_runs):
        for i_v, vval in enumerate(v_vals[v_test]):
            for i_v2, vval2 in enumerate(v_vals[v_test_2]):
                v[v_test] = vval
                v[v_test_2] = vval2
                run_key = f"_{v_test}_{v_test_2}_{i_v}_{i_v2}"
                print(f"[run_study] run {i_run + 1}/{n_random_runs} "
                      f"{v_test}={vval}"
                      + (f" {v_test_2}={vval2}" if v_test_2 != "void" else ""),
                      file=sys.stderr, flush=True)
                q_noise_guess = v["q_noise_guess"] if v_test == "q_noise_guess" \
                    else v["p"]
                q_mod = v["q"] if v_test != "q_guess" else v["q_guess"]

                data = generate_synthetic(
                    n=v["n"], p=v["p"], q=v["q"], q_noise=v["q_noise"],
                    mu_noise=v["mu_noise"], mu_str=v["mu_str"],
                    max_scale=v["max_scale"], n_test=n_test, seed=i_run,
                    dtype=dtype)
                models = build_models(data["X"], data["Y"], q_mod,
                                      q_noise_guess, models_to_run, seed=i_run)
                run_results, _ = train_and_eval(
                    models, data["X_test"], data["Y_test"], n_iter=n_iter,
                    lr=lr, lr_min=lr_min, loss_thresh=loss_thresh,
                    patience=patience, print_metrics=print_metrics,
                    block_every=block_every)
                for name, metrics in run_results.items():
                    metrics.update(v)
                    metrics["model"] = name
                    results[name + run_key] = metrics

        frame = pd.DataFrame.from_dict(results, orient="index")
        if i_run == 0:
            df = frame.copy()
            updated_cols = df.columns.difference(list(v.keys()) + ["model"])
            df[updated_cols] = 0.0
            if reject_nonconverged_runs:
                # separate accumulator over converged runs only
                # (experiments.py:353-365)
                df_conv = df.copy().rename(
                    index={label: label + "_conv" for label in df.index})
                n_success = {label + "_conv": 0 for label in df.index}
        df[updated_cols] += frame[updated_cols]
        if reject_nonconverged_runs:
            thresh = max(0.2, 5.0 * float(v["mu_noise"]))
            for label in frame.index:
                if results[label]["mean_err_abs"] < thresh:
                    df_conv.loc[label + "_conv", updated_cols] += \
                        frame.loc[label, updated_cols]
                    n_success[label + "_conv"] += 1

        # landmarks as in experiments.py:71, plus always at the final run so
        # short studies (n_runs not a multiple of 10) still export
        if ((i_run + 1) in landmarks or i_run + 1 == n_random_runs) \
                and export_results:
            df_part = df.copy()
            df_part[updated_cols] = df_part[updated_cols] / (i_run + 1)
            if reject_nonconverged_runs:
                df_conv_part = df_conv.copy()
                df_part["n_sucess_runs"] = float(i_run + 1)
                df_conv_part["n_sucess_runs"] = pd.Series(n_success)
                for label, count in n_success.items():
                    df_conv_part.loc[label, updated_cols] = \
                        df_conv_part.loc[label, updated_cols] / max(count, 1)
                df_part = pd.concat([df_part, df_conv_part], axis=0)
            partial = path[:-4] + f"_{i_run + 1}runs.csv"
            df_part.to_csv(partial)
            if i_run + 1 == n_random_runs:
                # also honor the requested path itself — callers (and the
                # round-3 builder, measurably) expect --out to exist; the
                # reference writes only suffixed landmarks (experiments.py:
                # 367-380), which cost this repo a 4.5 h study that looked
                # like a silent failure because only *_1runs.csv was written
                df_part.to_csv(path)
    return results
