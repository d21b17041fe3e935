#!/usr/bin/env python
"""Torch-fp32 oracle for the exact-ICM training run on the DEFAULT synthetic
config (VERDICT r2 item 1): does the reference's own training recipe reach the
PLMC-consistent optimum, or does it exhibit the same slow-noise-descent /
oscillation the JAX rebuild shows?

From-scratch eager-torch mirror of the gpytorch 1.11 model the reference
builds (projected_lmc.py:438-489 + experiments.py:183-283):

  * Matern-2.5 kernel, softplus raw lengthscale init 0 (gpytorch default);
  * IndexKernel task covariance B = F Fᵀ + diag(softplus(raw_var)),
    F SVD-initialized from the labels (projected_lmc.py:468-476),
    raw_var ~ N(0,1) (gpytorch IndexKernel init);
  * MultitaskGaussianLikelihood(rank=p): Σt = G Gᵀ + softplus+1e-4 global,
    G ~ N(0,1) (gpytorch init);
  * exact MLL of N(vec Y; 0, K ⊗ B + I_n ⊗ Σt) / (n·p) via the joint
    whitening trick (Σt^{-1/2} eig + K eig) — mathematically the exact MLL
    gpytorch's CG+Lanczos stochastically estimates;
  * AdamW(lr=1e-2, the torch default weight_decay 1e-2), LambdaLR linear
    1e-2 → 1e-3 over 10k iters (experiments.py:84), plateau rule
    thresh 2.5e-6 / patience 500 evaluated but NOT enforced (we record
    where it would fire).

Data: the exact generator of experiments.py:136-170 at the default config
(n=500, p=100, q=q_noise=25, mu_noise=0.1, mu_str=0.9), seed 0.

Writes results/oracle_icm_synthetic.json: loss trajectory (every 10 iters),
noise-metric trajectory, R² at the end, and the would-be plateau iteration.
CPU-only; ~40 min at 40k iters.
"""

import argparse
import json
import math
import os
import sys
import time

import numpy as np
import torch

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

torch.set_num_threads(os.cpu_count() or 8)
SQRT5 = math.sqrt(5.0)


def make_data(n=500, p=100, q=25, q_noise=25, mu_noise=0.1, mu_str=0.9,
              max_scale=0.5, min_scale=0.01, n_test=2500, seed=0):
    """experiments.py:136-170 exactly (torch RNG, same op order)."""
    torch.manual_seed(seed)
    np.random.seed(seed)
    lscales = torch.linspace(min_scale, max_scale, q)
    X_train = torch.linspace(-1, 1, n)
    X_test = 2 * torch.rand(n_test) - 1
    X = torch.cat([X_train, X_test], dim=0)
    H_true = torch.randn(q, p)
    gp_vals = []
    Xc = X[:, None]
    for i in range(q):
        d2 = (Xc - Xc.T) ** 2 / lscales[i] ** 2
        r = torch.sqrt(d2.clamp_min(1e-30))
        c = SQRT5 * r
        K = (1 + c + (5.0 / 3.0) * d2) * torch.exp(-c)
        K = K.double()
        jitter = 1e-6
        while True:        # long lengthscales leave K near-singular in fp64
            try:
                L = torch.linalg.cholesky(
                    K + jitter * torch.eye(n + n_test, dtype=torch.float64))
                break
            except torch._C._LinAlgError:
                jitter *= 10
        gp_vals.append((L @ torch.randn(n + n_test, dtype=torch.float64)).float())
    gp_vals = torch.stack(gp_vals)
    Y_sig = gp_vals.T @ H_true * (1 - mu_noise)
    H_true_hid = torch.randn(q_noise, p)
    Y_noise_com = torch.randn(q_noise, n + n_test).T @ H_true_hid * mu_str
    noise_levels = torch.rand(p) + 0.1
    Y_noise_spec = (torch.sqrt(noise_levels)[:, None]
                    * torch.randn(p, n + n_test)).T * (1 - mu_str)
    Y = Y_sig + (Y_noise_com + Y_noise_spec) * mu_noise
    return (Xc[:n], Y[:n], Xc[n:], Y[n:])


def init_factor(Y, q):
    """init_lmc_coefficients (projected_lmc.py:183-201): U·S/√(n−1), (q,p)."""
    from sklearn.utils.extmath import randomized_svd
    U, S, _ = randomized_svd(np.asarray(Y.T.double()), n_components=q,
                             random_state=0)
    return torch.tensor((U * S[None, :]).astype(np.float32)) \
        / math.sqrt(Y.shape[0] - 1)


class _IcmNll(torch.autograd.Function):
    """Exact ICM NLL with an ANALYTIC backward (no autograd through eigh —
    torch's eigh backward is unstable on the Matern spectrum's clustered
    tail eigenvalues and NaN'd a plain-autograd run within 500 iters).

    Gradient identities (Σ = K⊗B + I⊗Σt, task-fastest vec; α = Σ⁻¹ vec Y
    in matrix form A; Σ⁻¹ = (Q ⊗ R⁻ᵀU) S⁻¹ (Q ⊗ R⁻ᵀU)ᵀ with K = Q D Qᵀ,
    R = chol(Σt), R⁻¹BR⁻ᵀ = U Λ Uᵀ, S = DΛᵀ + 1):

      dL/dK  = ½ (Q diag(Σ_j λ_j/S_·j) Qᵀ − A B Aᵀ)
      dL/dB  = ½ (R⁻ᵀU diag(Σ_i D_i/S_i·) UᵀR⁻¹ − Aᵀ K A)
      dL/dΣt = ½ (R⁻ᵀU diag(Σ_i 1/S_i·) UᵀR⁻¹ − Aᵀ A)

    — the standard ½(tr(Σ⁻¹ dΣ) − αᵀ dΣ α) split evaluated exactly through
    the joint eigenbasis."""

    @staticmethod
    def forward(ctx, raw_ls, F, raw_var, G, raw_noise, X, Y):
        with torch.no_grad():
            n, p = Y.shape
            ls = torch.nn.functional.softplus(raw_ls)
            diff = X - X.T
            d2 = (diff / ls) ** 2
            r = torch.sqrt(d2.clamp_min(1e-30))
            c = SQRT5 * r
            e = torch.exp(-c)
            K = (1 + c + (5.0 / 3.0) * d2) * e

            sv = torch.nn.functional.softplus(raw_var)
            B = F @ F.T + torch.diag(sv)
            sig_g = torch.nn.functional.softplus(raw_noise) + 1e-4
            Sigma_t = G @ G.T + sig_g * torch.eye(p, dtype=G.dtype)

            R = torch.linalg.cholesky(Sigma_t)
            RinvB = torch.linalg.solve_triangular(R, B, upper=False)
            Bt = torch.linalg.solve_triangular(R, RinvB.T, upper=False).T
            lam, U = torch.linalg.eigh(0.5 * (Bt + Bt.T))
            D, Q = torch.linalg.eigh(K + 1e-6 * torch.eye(n, dtype=K.dtype))
            D = D.clamp_min(1e-10)
            P = torch.linalg.solve_triangular(
                R.T, U, upper=True, left=True)                # R⁻ᵀ U (p,p)

            Yw = Q.T @ Y @ P                                  # (n, p)
            S = D[:, None] * lam[None, :] + 1.0
            Aw = Yw / S
            A = Q @ Aw @ P.T                                  # (n, p) = mat α
            quad = (Yw * Aw).sum()
            logdet = torch.log(S).sum() \
                + 2.0 * n * torch.log(torch.diagonal(R)).sum()
            nll = 0.5 * (quad + logdet + n * p * math.log(2 * math.pi)) \
                / (n * p)
            ctx.save_for_backward(raw_ls, F, raw_var, G, raw_noise,
                                  X, Y, K, B, d2, e, c, r, D, Q, lam, P, A, S)
        return nll

    @staticmethod
    def backward(ctx, g):
        (raw_ls, F, raw_var, G, raw_noise, X, Y, K, B, d2, e, c, r,
         D, Q, lam, P, A, S) = ctx.saved_tensors
        n, p = Y.shape
        scale = float(g) * 0.5 / (n * p)
        with torch.no_grad():
            Sinv = 1.0 / S                                    # (n, p)
            # K-side
            wK = Sinv @ lam                                   # (n,)
            Gk = Q @ (wK[:, None] * Q.T) - A @ B @ A.T        # (n, n)
            # dK/d(d2) for matern25; chain d2 -> ls -> raw_ls
            dprof = (-5.0 / 6.0) * (1 + c) * e
            ls = torch.nn.functional.softplus(raw_ls)
            dK_dls = dprof * (-2.0 * d2 / ls)
            sig_ls = torch.sigmoid(raw_ls)
            d_raw_ls = scale * (Gk * dK_dls).sum() * sig_ls
            # B-side
            vB = D @ Sinv                                     # (p,)
            GB = P @ (vB[:, None] * P.T) - A.T @ K @ A        # (p, p)
            dF = scale * 2.0 * (GB @ F)
            d_raw_var = scale * torch.diagonal(GB) \
                * torch.sigmoid(raw_var)
            # Σt-side
            uS = Sinv.sum(0)                                  # (p,)
            GS = P @ (uS[:, None] * P.T) - A.T @ A
            dG = scale * 2.0 * (GS @ G)
            d_raw_noise = (scale * torch.trace(GS)
                           * torch.sigmoid(raw_noise)).reshape(1)
        return (d_raw_ls.reshape(1), dF, d_raw_var, dG, d_raw_noise,
                None, None)


def icm_mll(X, Y, raw_ls, F, raw_var, G, raw_noise):
    """-log N(vec Y; 0, K⊗B + I⊗Σt)/(n·p), exact (whitening + eig),
    analytic gradients."""
    return _IcmNll.apply(raw_ls, F, raw_var, G, raw_noise, X, Y)


def noise_metric(G, raw_noise):
    """experiments.py:333-340 + :98: mean diag of recovered Σ."""
    with torch.no_grad():
        p = G.shape[0]
        sig_g = float(torch.nn.functional.softplus(raw_noise) + 1e-4)
        H = G.clone()
        H[range(p), range(p)] = torch.diagonal(G) + sig_g
        return float((H ** 2).sum() / p)


def predict(X, Y, Xt, raw_ls, F, raw_var, G, raw_noise):
    """Posterior mean at Xt (exact, whitened path)."""
    with torch.no_grad():
        n, p = Y.shape
        ls = torch.nn.functional.softplus(raw_ls)
        d2 = ((X - X.T) / ls) ** 2
        r = torch.sqrt(d2.clamp_min(1e-30)); c = SQRT5 * r
        K = (1 + c + (5.0 / 3.0) * d2) * torch.exp(-c)
        d2s = ((Xt - X.T) / ls) ** 2
        rs = torch.sqrt(d2s.clamp_min(1e-30)); cs = SQRT5 * rs
        Ks = (1 + cs + (5.0 / 3.0) * d2s) * torch.exp(-cs)   # (n*, n)
        B = F @ F.T + torch.diag(torch.nn.functional.softplus(raw_var))
        sig_g = torch.nn.functional.softplus(raw_noise) + 1e-4
        Sigma_t = G @ G.T + sig_g * torch.eye(p, dtype=G.dtype)
        R = torch.linalg.cholesky(Sigma_t + 1e-8 * torch.eye(p, dtype=G.dtype))
        RinvB = torch.linalg.solve_triangular(R, B, upper=False)
        Bt = torch.linalg.solve_triangular(R, RinvB.T, upper=False).T
        Bt = 0.5 * (Bt + Bt.T)
        lam, U = torch.linalg.eigh(Bt)
        D, Q = torch.linalg.eigh(K + 1e-6 * torch.eye(n, dtype=K.dtype))
        D = D.clamp_min(1e-10)
        Yw = Q.T @ torch.linalg.solve_triangular(R, Y.T, upper=False).T @ U
        S = D[:, None] * lam[None, :] + 1.0
        alpha_w = Yw / S                                      # (n, p)
        # unwhiten: α = R⁻ᵀ U αw' Qᵀ rows...; mean* = Ks α B (task mixing)
        Alpha = Q @ alpha_w @ (U.T @ torch.linalg.inv(R))     # (n, p) vec-form
        return Ks @ Alpha @ B


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n-iter", type=int, default=40000)
    ap.add_argument("--lr", type=float, default=1e-2)
    ap.add_argument("--out", default="results/oracle_icm_synthetic.json")
    args = ap.parse_args()

    X, Y, Xt, Yt = make_data()
    n, p, q = X.shape[0], Y.shape[1], 25

    F0 = init_factor(Y, q)                     # (p, q) covar_factor
    # fp64 throughout: fp32 LAPACK eigh error (~1e-5·‖K‖) exceeds the 1e-6
    # jitter floor of the Matern tail spectrum, corrupting the logdet
    X, Y, Xt, Yt = X.double(), Y.double(), Xt.double(), Yt.double()
    F = F0.double().clone().requires_grad_(True)
    torch.manual_seed(0)
    raw_var = torch.randn(p, dtype=torch.float64, requires_grad=True)
    G = torch.randn(p, p, dtype=torch.float64, requires_grad=True)
    raw_noise = torch.zeros(1, dtype=torch.float64, requires_grad=True)
    raw_ls = torch.zeros(1, dtype=torch.float64, requires_grad=True)
    params = [raw_ls, F, raw_var, G, raw_noise]
    opt = torch.optim.AdamW(params, lr=args.lr)
    last_epoch = 10000
    lr_min, lr_max = 1e-3, args.lr
    sched = torch.optim.lr_scheduler.LambdaLR(
        opt, lambda i: (i / last_epoch * lr_min / lr_max
                        + (last_epoch - i) / last_epoch)
        if i <= last_epoch else lr_min / lr_max)

    losses, noises = [], []
    plateau_id, plateau_at, last_loss = 0, None, None
    t0 = time.time()
    for i in range(args.n_iter):
        opt.zero_grad()
        loss = icm_mll(X, Y, raw_ls, F, raw_var, G, raw_noise)
        loss.backward()
        opt.step()
        sched.step()
        lv = float(loss)
        if i % 10 == 0:
            losses.append(round(lv, 6))
        if i % 500 == 0:
            noises.append(round(noise_metric(G.detach(), raw_noise.detach()), 4))
            print(f"iter {i}: loss {lv:.6f} noise {noises[-1]:.3f} "
                  f"({time.time()-t0:.0f}s)", flush=True)
        if last_loss is not None and abs(1 - lv / last_loss) < 2.5e-6:
            plateau_id += 1
            if plateau_id > 500 and plateau_at is None:
                plateau_at = i
                print(f"[plateau would fire at iter {i}]", flush=True)
        else:
            plateau_id = 0
        last_loss = lv

    mean_pred = predict(X, Y, Xt, raw_ls.detach(), F.detach(),
                        raw_var.detach(), G.detach(), raw_noise.detach())
    err2 = (Yt - mean_pred) ** 2
    R2 = float((1 - err2.mean(0) / Yt.var(0)).mean())
    out = dict(config=dict(n=n, p=p, q=q, n_iter=args.n_iter, lr=args.lr),
               final_loss=float(last_loss), R2=round(R2, 4),
               noise_trajectory_every500=noises,
               loss_trajectory_every10=losses,
               plateau_would_fire_at=plateau_at,
               wall_s=round(time.time() - t0, 1))
    os.makedirs(os.path.dirname(args.out) or ".", exist_ok=True)
    with open(args.out, "w") as f:
        json.dump(out, f)
    print(json.dumps({k: v for k, v in out.items()
                      if "trajectory" not in k}))


if __name__ == "__main__":
    main()
