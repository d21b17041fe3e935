#!/usr/bin/env python
"""Torch-fp64 oracle for the tidal SVGP-LMC collapse (VERDICT r2 item 2).

results/var_tidal_collapse.md claims the ELBO-gradient collapse of the
variational model on the bramblemet tidal workload is "inherited from the
reference's math, not introduced by the rebuild" — argued from a JAX
gradient dump only. This script makes it a MEASURED torch claim:

  * builds the rebuild's tidal `var` model (spectral-mixture kernel
    initialized from data, LHC inducing points scaled to the data range,
    SVD-initialized H, whitened Cholesky variational distribution) and
    TRANSFERS every initial parameter into torch fp64;
  * trains a from-scratch torch implementation of the SAME whitened SVGP
    ELBO (the math of gpytorch's VariationalStrategy +
    LMCVariationalStrategy + VariationalELBO, reference recipe
    projected_lmc.py:686-813 + experiments.py:237: AdamW on model +
    likelihood, LambdaLR 1e-2→1e-3) for --n-iter steps;
  * records the ELBO trajectory, ‖H‖, the learned noise, and test R².

Collapse signature to compare against the JAX measurement
(var_tidal_collapse.md): −ELBO plateaus at ≈6.175 nats/datum, H → 0,
noise → Var(Y) = 1 per z-scored task, R² ≈ 0.

Writes results/oracle_var_tidal.json. CPU-only, ~10 min at 4k iters.
Run with:  JAX_PLATFORMS=cpu python scripts/oracle_var_tidal.py
(the JAX side is used only to construct/transfer the initial state).
"""

import argparse
import json
import math
import os
import sys
import time

os.environ.setdefault("JAX_PLATFORMS", "cpu")
os.environ.pop("PALLAS_AXON_POOL_IPS", None)  # never claim the (busy) chip

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import torch

torch.set_default_dtype(torch.float64)


def softplus(x):
    return torch.nn.functional.softplus(x)


def inv_softplus(y):
    y = torch.as_tensor(y, dtype=torch.float64)
    # softplus(x) ≈ x for large x (the tidal raw frequencies are ~3.5e4 —
    # expm1 would overflow)
    return torch.where(y > 20.0, y, torch.log(torch.expm1(y.clamp(max=20.0))))


def chol_ladder(Kzz, j0=1e-6):
    """Escalating-jitter batched Cholesky (mirrors ops/cholesky.safe_cholesky;
    spectral-mixture K_zz on QMC inducing sets is near-singular)."""
    j = j0
    m = Kzz.shape[-1]
    while True:
        try:
            return torch.linalg.cholesky(Kzz + j * torch.eye(m)[None])
        except torch._C._LinAlgError:
            j *= 10
            if j > 1e3:
                raise


def sm_kernel(x1, x2, w, mu, sig):
    """k_b(x1,x2) = Σ_q w_bq Π_d exp(−2π²τ²σ²) cos(2πτμ); x (n,1);
    w (B,Q), mu/sig (B,Q,1,1) -> (B,n,m). Mirrors kernels.py:528-546."""
    tau = x1[:, None, :] - x2[None, :, :]                   # (n, m, 1)
    tau = tau[None, None]                                   # (1,1,n,m,1)
    exp_t = torch.exp(-2 * math.pi ** 2 * tau ** 2
                      * (sig[..., None, :] ** 2))           # (B,Q,n,m,1)
    cos_t = torch.cos(2 * math.pi * tau * mu[..., None, :])
    comp = (exp_t * cos_t).prod(-1)                         # (B,Q,n,m)
    return (w[..., None, None] * comp).sum(-3)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n-iter", type=int, default=4000)
    ap.add_argument("--lr", type=float, default=1e-2)
    ap.add_argument("--out", default="results/oracle_var_tidal.json")
    args = ap.parse_args()

    from projected_lmc_tpu.experiments.realdata import load_tidal
    from projected_lmc_tpu.experiments.driver import build_models

    data = load_tidal()
    models = build_models(data["X"], data["Y"], q_model=data["q"],
                          q_noise_guess=0, models_to_run=["var"],
                          kernel_type=data["kernel_type"], mean_type="zero",
                          ker_kwargs=data["ker_kwargs"],
                          n_ind_points=None, var_ind_range="data")
    jm = models["var"]

    X = torch.as_tensor(np.asarray(data["X"], np.float64))
    Y = torch.as_tensor(np.asarray(data["Y"], np.float64))
    Xt = torch.as_tensor(np.asarray(data["X_test"], np.float64))
    Yt = torch.as_tensor(np.asarray(data["Y_test"], np.float64))
    n, p = Y.shape
    q = jm.n_latents
    cm = jm.covar_module

    # --- transfer the EXACT initial state -------------------------------
    raw_w = inv_softplus(np.asarray(cm.mixture_weights, np.float64)
                         ).clone().requires_grad_(True)
    raw_mu = inv_softplus(np.asarray(cm.mixture_means, np.float64)
                          ).clone().requires_grad_(True)
    raw_sig = inv_softplus(np.asarray(cm.mixture_scales, np.float64)
                           ).clone().requires_grad_(True)
    Z = torch.as_tensor(np.asarray(jm.inducing_points, np.float64)
                        ).clone().requires_grad_(True)
    H = torch.as_tensor(np.asarray(jm.lmc_coeffs, np.float64)
                        ).clone().requires_grad_(True)          # (q, p)
    vm = torch.as_tensor(np.asarray(jm.var_mean, np.float64)
                         ).clone().requires_grad_(True)         # (q, m)
    vc = torch.as_tensor(np.asarray(jm.var_chol, np.float64)
                         ).clone().requires_grad_(True)         # (q, m, m)
    raw_tn = torch.zeros(p, requires_grad=True)   # GreaterThan(1e-4): sp+1e-4
    raw_gn = torch.zeros(1, requires_grad=True)
    m_ind = Z.shape[0]

    H0_norm = float(H.detach().norm())

    def elbo():
        w, mu, sig = softplus(raw_w), softplus(raw_mu), softplus(raw_sig)
        Kzz = sm_kernel(Z, Z, w, mu, sig)                    # (q, m, m)
        Lzz = chol_ladder(Kzz)
        Kxz = sm_kernel(X, Z, w, mu, sig)                    # (q, n, m)
        A = torch.linalg.solve_triangular(
            Lzz, Kxz.transpose(-1, -2), upper=False).transpose(-1, -2)
        S_chol = torch.tril(vc)
        mean_l = (A @ vm[..., None])[..., 0]                 # (q, n)
        AS = A @ S_chol
        kdiag = (w[..., None] * torch.ones(1, 1, X.shape[0])).sum(-2)
        var_l = (kdiag - (A * A).sum(-1) + (AS * AS).sum(-1)).clamp_min(1e-12)
        mean = mean_l.T @ H                                  # (n, p)
        sig2_t = softplus(raw_tn) + 1e-4 + softplus(raw_gn) + 1e-4  # (p,)
        delta = Y - mean
        wsw = (H * (H / sig2_t[None, :])).sum(-1)            # (q,)
        exp_ll = -0.5 * ((delta ** 2 / sig2_t[None, :]).sum()
                         + (var_l * wsw[:, None]).sum()
                         + n * torch.log(sig2_t).sum()
                         + n * p * math.log(2 * math.pi))
        diag = torch.diagonal(S_chol, dim1=-2, dim2=-1)
        kl = 0.5 * ((S_chol ** 2).sum() + (vm ** 2).sum()
                    - q * m_ind - torch.log(diag ** 2).sum())
        return (exp_ll - kl) / n

    params = [raw_w, raw_mu, raw_sig, Z, H, vm, vc, raw_tn, raw_gn]
    opt = torch.optim.AdamW(params, lr=args.lr)
    last_epoch = 10000
    sched = torch.optim.lr_scheduler.LambdaLR(
        opt, lambda i: (i / last_epoch * 0.1 + (last_epoch - i) / last_epoch)
        if i <= last_epoch else 0.1)

    traj = []
    t0 = time.time()
    for i in range(args.n_iter):
        opt.zero_grad()
        loss = -elbo()
        loss.backward()
        opt.step()
        sched.step()
        if i % 10 == 0:
            traj.append(round(float(loss), 5))
        if i % 500 == 0:
            print(f"iter {i}: -elbo/n {float(loss):.4f} "
                  f"|H| {float(H.detach().norm()):.4f} "
                  f"noise {float((softplus(raw_tn)+softplus(raw_gn)).mean() + 2e-4):.4f} "
                  f"({time.time()-t0:.0f}s)", flush=True)

    # test prediction (posterior mean at Xt)
    with torch.no_grad():
        w, mu, sig = softplus(raw_w), softplus(raw_mu), softplus(raw_sig)
        Kzz = sm_kernel(Z, Z, w, mu, sig)
        Lzz = chol_ladder(Kzz)
        Kxz = sm_kernel(Xt, Z, w, mu, sig)
        A = torch.linalg.solve_triangular(
            Lzz, Kxz.transpose(-1, -2), upper=False).transpose(-1, -2)
        mean = (A @ vm[..., None])[..., 0].T @ H
        err2 = (Yt - mean) ** 2
        R2 = float((1 - err2.mean(0) / Yt.var(0)).mean())
        final = dict(
            n_iter=args.n_iter,
            final_neg_elbo_per_datum=round(float(-elbo()), 4),
            H_norm_init=round(H0_norm, 4),
            H_norm_final=round(float(H.norm()), 6),
            mean_noise_final=round(float((softplus(raw_tn)
                                          + softplus(raw_gn)).mean()
                                         + 2e-4), 4),
            var_mean_absmax=round(float(vm.abs().max()), 6),
            test_R2=round(R2, 4),
            jax_collapse_signature=dict(neg_elbo_plateau=6.175,
                                        H_final=0.0, test_R2=-0.03),
            wall_s=round(time.time() - t0, 1),
        )
    out = dict(final, neg_elbo_every10=traj)
    os.makedirs(os.path.dirname(args.out) or ".", exist_ok=True)
    with open(args.out, "w") as f:
        json.dump(out, f)
    print(json.dumps(final, indent=1))


if __name__ == "__main__":
    main()
