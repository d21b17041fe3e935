#!/usr/bin/env python
"""Torch-fp64 oracle for the FULL-B̃ ProjectedGPModel training trajectory on
the default synthetic config (VERDICT r3 item 1): does the reference's own
PLMC recipe reproduce the test-R² decline the JAX rebuild shows
(0.980 @2.5k → 0.938 @40k → 0.920 @100k while train MLL improves), or does
the reference hold 0.98 (which would mean a JAX-side bug)?

From-scratch eager-torch mirror of the gpytorch-1.11 model the reference
builds (projected_lmc.py:893-1241 + experiments.py:196-201,256-284), full
PLMC config (BDN=False, diagonal_B=False, scalar_B=False, diagonal_R=False,
bulk=True):

  * mixing matrix: bulk dense H (p×p) initialized U·diag(S[:q]/√(n−1) ⊕ 1)
    from randomized_svd(Yᵀ, p, random_state=0) (projected_lmc.py:931-963);
    Q, R, Q⊥ recovered by torch.linalg.qr(H) EVERY step (:864-875);
  * latent exact GPs: batch-q Matern-2.5, raw lengthscale 0 (softplus ⇒
    ls≈0.693, gpytorch default), ZeroMean;
  * projected likelihood: batch-q Gaussian, σ² = softplus(raw)+e⁻⁹
    (GreaterThan(exp(-9)) constraint, :916-921), raw init 0;
  * full B̃: B_tilde_inv_chol lower-tri param, diag exp(clamp(·,−9,9)),
    init diag log(1/noise_init)=log(100) (:983-984 + LowerTriangularParam
    :242-258); M cross-term (q×(p−q)) zeros (:987-988);
  * loss = −[Σ_b log N(ỹ_b; 0, K_b+σ_b²I)/n + proj terms] term-for-term
    per ProjectedLMCmll (:1194-1240): −½·2Σlog B̃root_ii,
    −½‖Y Q⊥ L_B̃⁻¹‖²/n, −½Σlog R_ii², −½(p−q)log 2π;
  * AdamW(lr=1e-2, torch-default weight_decay 1e-2 over ALL params incl. H),
    LambdaLR linear 1e-2→1e-3 over 10k then flat (experiments.py:84);
    plateau rule (2.5e-6 / 500, experiments.py:276-282) recorded but NOT
    enforced — the question is the long-horizon trajectory.

Everything autodiff (no eigh anywhere — Cholesky+QR backward are stable in
fp64); data = the op-order-exact generator mirror (oracle_icm_synthetic).

Writes --out incrementally every checkpoint: loss trajectory, test-R²
trajectory (posterior latent mean mixed up by H[:, :q]ᵀ, :1140-1146),
plateau-would-fire iteration. CPU fp64, single core.
"""

import argparse
import json
import math
import os
import sys
import time

import numpy as np
import torch

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
from oracle_icm_synthetic import make_data  # noqa: E402  op-order-exact generator

torch.set_num_threads(os.cpu_count() or 8)
SQRT5 = math.sqrt(5.0)
LOG2PI = math.log(2 * math.pi)


def init_H(Y, q):
    """projected_lmc.py:931-963 bulk path: Q_plus,S = randomized_svd(Yᵀ, p,
    random_state=0); H = Q_plus @ (eye(p) with [:q,:q]=diag(S[:q])/√(n−1))."""
    from sklearn.utils.extmath import randomized_svd
    n, p = Y.shape
    U, S, _ = randomized_svd(np.asarray(Y.T.double()), n_components=p,
                             random_state=0)
    Rp = np.eye(p)
    Rp[:q, :q] = np.diag(S[:q]) / math.sqrt(n - 1)
    return torch.tensor(U @ Rp, dtype=torch.float64)


def matern25_batch(X, ls):
    """(q, n, n) Matern-2.5 stack; X (n, 1), ls (q, 1, 1)."""
    diff = X[None] - X.T[None]                                # (1, n, n)
    d2 = (diff / ls) ** 2
    r = torch.sqrt(d2.clamp_min(1e-30))
    c = SQRT5 * r
    return (1 + c + (5.0 / 3.0) * d2) * torch.exp(-c)


class _LatentLogProb(torch.autograd.Function):
    """Σ_b log N(proj_b; 0, K_b(ls_b) + σ_b² I) with ANALYTIC gradients —
    autograd through the batched fp64 Cholesky + (q,n,n) kernel build costs
    ~3.4 s/iter on the single host core; the analytic backward (standard GP
    MLL identities G_b = ½(α_b α_bᵀ − A_b⁻¹), dK/dls via the Matern-2.5
    dprofile, dll/dproj = −α) reuses the forward's factor and saved
    elementwise pieces. proj and raw_noise stay autograd inputs so the
    H/M/σ paths through project_data compose outside."""

    @staticmethod
    def forward(ctx, raw_ls, raw_noise, proj, X):
        with torch.no_grad():
            q, n = proj.shape
            ls = torch.nn.functional.softplus(raw_ls)          # (q,1,1)
            sig2 = torch.nn.functional.softplus(raw_noise) + math.exp(-9)
            diff = X[None] - X.T[None]
            d2 = (diff / ls) ** 2
            c = SQRT5 * torch.sqrt(d2.clamp_min(1e-30))
            e = torch.exp(-c)
            A = (1 + c + (5.0 / 3.0) * d2) * e
            A = A + sig2[:, None, None] * torch.eye(n, dtype=A.dtype)[None]
            L = torch.linalg.cholesky(A)
            alpha = torch.cholesky_solve(proj[:, :, None], L)[:, :, 0]
            quad = (proj * alpha).sum()
            logdet = 2.0 * torch.log(
                torch.diagonal(L, dim1=-2, dim2=-1)).sum()
            ll = -0.5 * (quad + logdet + q * n * LOG2PI)
            ctx.save_for_backward(raw_ls, raw_noise, L, alpha, d2, c, e)
        return ll

    @staticmethod
    def backward(ctx, g):
        raw_ls, raw_noise, L, alpha, d2, c, e = ctx.saved_tensors
        with torch.no_grad():
            q, n = alpha.shape
            eye = torch.eye(n, dtype=L.dtype)[None].expand(q, n, n)
            Ainv = torch.cholesky_solve(eye.contiguous(), L)   # (q,n,n)
            G = 0.5 * (alpha[:, :, None] * alpha[:, None, :] - Ainv)
            # lengthscale chain: dK/d(d2) = −(5/6)(1+c)e^{−c}; d(d2)/dls
            # = −2 d2/ls (scalar ls per latent)
            ls = torch.nn.functional.softplus(raw_ls)[:, 0, 0]
            dK_dls = ((-5.0 / 6.0) * (1 + c) * e) * (-2.0 * d2) \
                / ls[:, None, None]
            d_raw_ls = (G * dK_dls).sum(dim=(-2, -1)) \
                * torch.sigmoid(raw_ls[:, 0, 0])
            d_raw_noise = torch.diagonal(G, dim1=-2, dim2=-1).sum(-1) \
                * torch.sigmoid(raw_noise)
            d_proj = -alpha
        return (g * d_raw_ls.reshape(-1, 1, 1), g * d_raw_noise,
                g * d_proj, None)


def plmc_loss(H, raw_ls, raw_noise, B_raw, M, X, Y):
    """−ProjectedLMCmll (projected_lmc.py:1178-1241), full-B̃ + M config."""
    n, p = Y.shape
    q = raw_ls.shape[0]
    Q_full, R_full = torch.linalg.qr(H)                       # p×p each step
    Q1, Q_orth, R = Q_full[:, :q], Q_full[:, q:], R_full[:q, :q]
    sigma_p = torch.nn.functional.softplus(raw_noise) + math.exp(-9)  # (q,)

    # project_data (:1014-1021) with the M cross-term
    unscaled = Q1.T @ Y.T                                     # (q, n)
    proj = torch.linalg.solve_triangular(R, unscaled, upper=True)
    proj = proj + sigma_p[:, None] * (M @ (Q_orth.T @ Y.T))   # (q, n)

    # batched latent exact-GP log-prob under the projected likelihood
    latent_res = _LatentLogProb.apply(raw_ls, raw_noise, proj, X) / n

    # projection terms (:1206-1238)
    diag_raw = torch.diagonal(B_raw)
    Lic = torch.tril(B_raw, -1) + torch.diag_embed(
        torch.exp(torch.clamp(diag_raw, -9.0, 9.0)))          # B̃^{-1} chol
    log_root_diag = -torch.clamp(diag_raw, -9.0, 9.0)         # log B̃root_ii
    term0 = -0.5 * 2.0 * log_root_diag.sum()
    root = Y @ Q_orth @ Lic                                   # (n, p−q)
    term1 = -0.5 * (root * root).sum() / n
    term2 = -0.5 * torch.log(torch.diagonal(R) ** 2).sum()
    const = -0.5 * (p - q) * LOG2PI
    return -(latent_res + term0 + term1 + term2 + const)


@torch.no_grad()
def test_r2(H, raw_ls, raw_noise, M, X, Y, Xt, Yt):
    """Posterior task mean at Xt (eval path :1133-1146) → mean R² over
    tasks (compute_metrics, experiments.py:94)."""
    n, p = Y.shape
    q = raw_ls.shape[0]
    Q_full, R_full = torch.linalg.qr(H)
    Q1, Q_orth, R = Q_full[:, :q], Q_full[:, q:], R_full[:q, :q]
    sigma_p = torch.nn.functional.softplus(raw_noise) + math.exp(-9)
    proj = torch.linalg.solve_triangular(R, Q1.T @ Y.T, upper=True)
    proj = proj + sigma_p[:, None] * (M @ (Q_orth.T @ Y.T))
    ls = torch.nn.functional.softplus(raw_ls)
    K = matern25_batch(X, ls)
    A = K + sigma_p[:, None, None] * torch.eye(n, dtype=K.dtype)[None]
    L = torch.linalg.cholesky(A)
    alpha = torch.cholesky_solve(proj[:, :, None], L)[:, :, 0]  # (q, n)
    diff = Xt[None] - X.T[None]
    d2 = (diff / ls) ** 2
    r = torch.sqrt(d2.clamp_min(1e-30))
    c = SQRT5 * r
    Ks = (1 + c + (5.0 / 3.0) * d2) * torch.exp(-c)           # (q, n*, n)
    lat_mean = torch.einsum("bij,bj->ib", Ks, alpha)          # (n*, q)
    mean = lat_mean @ H[:, :q].T                              # (n*, p)
    err2 = (Yt - mean) ** 2
    return float((1 - err2.mean(0) / Yt.var(0)).mean())


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n-iter", type=int, default=20000)
    ap.add_argument("--lr", type=float, default=1e-2)
    ap.add_argument("--r2-every", type=int, default=500)
    ap.add_argument("--ckpt-every", type=int, default=500)
    ap.add_argument("--out", default="results/oracle_plmc_synthetic.json")
    args = ap.parse_args()

    X, Y, Xt, Yt = make_data()                # default config, seed 0
    X, Y, Xt, Yt = X.double(), Y.double(), Xt.double(), Yt.double()
    n, p, q = X.shape[0], Y.shape[1], 25

    H = init_H(Y, q).clone().requires_grad_(True)
    raw_ls = torch.zeros(q, 1, 1, dtype=torch.float64, requires_grad=True)
    raw_noise = torch.zeros(q, dtype=torch.float64, requires_grad=True)
    B_raw = torch.diag_embed(
        math.log(100.0) * torch.ones(p - q, dtype=torch.float64)
    ).requires_grad_(True)
    M = torch.zeros(q, p - q, dtype=torch.float64, requires_grad=True)
    params = [H, raw_ls, raw_noise, B_raw, M]
    opt = torch.optim.AdamW(params, lr=args.lr)
    last_epoch, lr_min, lr_max = 10000, 1e-3, args.lr
    sched = torch.optim.lr_scheduler.LambdaLR(
        opt, lambda i: (i / last_epoch * lr_min / lr_max
                        + (last_epoch - i) / last_epoch)
        if i <= last_epoch else lr_min / lr_max)

    losses, r2s = [], []
    plateau_id, plateau_at, last_loss = 0, None, None
    t0 = time.time()

    def dump(i):
        out = dict(config=dict(n=n, p=p, q=q, n_iter=args.n_iter,
                               lr=args.lr, model="PLMC full-B_tilde",
                               seed=0, iters_done=i + 1),
                   loss_trajectory_every10=losses,
                   r2_trajectory=r2s,
                   plateau_would_fire_at=plateau_at,
                   wall_s=round(time.time() - t0, 1))
        if last_loss is not None:
            out["final_loss"] = round(last_loss, 6)
        if r2s:
            out["final_R2"] = r2s[-1][1]
        os.makedirs(os.path.dirname(args.out) or ".", exist_ok=True)
        with open(args.out + ".tmp", "w") as f:
            json.dump(out, f)
        os.replace(args.out + ".tmp", args.out)
        return out

    for i in range(args.n_iter):
        opt.zero_grad()
        loss = plmc_loss(H, raw_ls, raw_noise, B_raw, M, X, Y)
        loss.backward()
        opt.step()
        sched.step()
        lv = float(loss)
        if i % 10 == 0:
            losses.append(round(lv, 6))
        if i % args.r2_every == 0:
            r2s.append([i, round(test_r2(H.detach(), raw_ls.detach(),
                                         raw_noise.detach(), M.detach(),
                                         X, Y, Xt, Yt), 5)])
            print(f"iter {i}: loss {lv:.6f} R2 {r2s[-1][1]:.4f} "
                  f"({time.time()-t0:.0f}s)", flush=True)
        if last_loss is not None and abs(1 - lv / last_loss) < 2.5e-6:
            plateau_id += 1
            if plateau_id > 500 and plateau_at is None:
                plateau_at = i
                print(f"[plateau would fire at iter {i}]", flush=True)
        else:
            plateau_id = 0
        last_loss = lv
        if (i + 1) % args.ckpt_every == 0:
            dump(i)

    r2s.append([args.n_iter,
                round(test_r2(H.detach(), raw_ls.detach(),
                              raw_noise.detach(), M.detach(),
                              X, Y, Xt, Yt), 5)])
    out = dump(args.n_iter - 1)
    print(json.dumps({k: v for k, v in out.items()
                      if "trajectory" not in k}))


if __name__ == "__main__":
    main()
