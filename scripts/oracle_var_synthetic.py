#!/usr/bin/env python
"""Torch-fp64 oracle for the variational model on the DEFAULT SYNTHETIC
config (VERDICT r2 item 1, var half).

`results/icm_var_consistency.md` finding 3 attributes the round-2 var row
(R² 0.821 at a 2500-iter cap) to undertraining and reports the JAX model
still improving at 40k iters. This script provides the torch side: a
from-scratch fp64 implementation of the SAME whitened SVGP ELBO
(gpytorch's VariationalStrategy + LMCVariationalStrategy + VariationalELBO
math — the reference recipe, projected_lmc.py:686-813 + experiments.py:
189-196,235-237) seeded with the rebuild's EXACT initial state on the
reference's default synthetic config (n=500, p=100, q=25, rank-p=100 task
noise, m=⌈n/1.5⌉=333 inducing, Matérn-5/2, AdamW 1e-2 + LambdaLR
1e-2→1e-3@10k).

Surface-parity check: the rebuild's −ELBO at this exact init is 568.46
nats/datum — the oracle must reproduce it at iter 0.

Writes --out (default results/oracle_var_synthetic.json), updating the
JSON every --checkpoint-every iterations so partial runs still leave
evidence. CPU-only fp64; ~1.5-3 s/iter on one core.

Run:  JAX_PLATFORMS=cpu python scripts/oracle_var_synthetic.py --n-iter 3000
(JAX is used only to construct/transfer the initial state.)
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
    y = torch.as_tensor(np.asarray(y, np.float64))
    return torch.where(y > 20.0, y, torch.log(torch.expm1(y.clamp(max=20.0))))


def chol_ladder(K, j0=1e-6):
    j = j0
    m = K.shape[-1]
    while True:
        try:
            return torch.linalg.cholesky(K + j * torch.eye(m)[None])
        except torch._C._LinAlgError:
            j *= 10
            if j > 1e3:
                raise


def matern25(x1, x2, ls):
    """Batched Matérn-5/2, unit outputscale (kernels.py:354-385 semantics).
    x1 (n,d), x2 (m,d), ls (q,1,d) -> (q,n,m)."""
    a = x1[None] / ls                                     # (q, n, d)
    b = x2[None] / ls
    d2 = ((a[:, :, None, :] - b[:, None, :, :]) ** 2).sum(-1).clamp_min(1e-30)
    r = torch.sqrt(d2)
    c = math.sqrt(5.0) * r
    return (1.0 + c + (5.0 / 3.0) * d2) * torch.exp(-c)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n-iter", type=int, default=3000)
    ap.add_argument("--lr", type=float, default=1e-2)
    ap.add_argument("--checkpoint-every", type=int, default=250)
    ap.add_argument("--out", default="results/oracle_var_synthetic.json")
    ap.add_argument("--seed", type=int, default=0,
                    help="perturbation seed: != 0 applies 1e-4 relative "
                         "Gaussian noise to every trainable param after the "
                         "exact-init transfer — the chaotic-divergence BAND "
                         "(VERDICT r3 item 6: same data, same recipe, "
                         "nearly-identical starts; trajectory spread = "
                         "optimization chaos, not implementation gap)")
    ap.add_argument("--state", default=None,
                    help="torch.save checkpoint path: written at every "
                         "--checkpoint-every, loaded (params + Adam moments "
                         "+ lr-sched step + trajectory) when it exists — so "
                         "the single-core ~1 s/iter oracle can extend its "
                         "horizon across sessions instead of re-running")
    args = ap.parse_args()

    # The JAX part (init transfer) is seed-deterministic and tiny; force it
    # onto CPU so the hours-long torch oracle never blocks on (or holds) the
    # chip claim while chip studies run (CLAUDE.md: JAX_PLATFORMS env is
    # ignored, sitecustomize registers the TPU eagerly).
    import jax
    jax.config.update("jax_platforms", "cpu")
    if jax.default_backend() != "cpu":
        from jax._src import xla_bridge as _xb
        _xb._clear_backends()
        _xb.get_backend.cache_clear()
    assert jax.default_backend() == "cpu"

    from projected_lmc_tpu.experiments.synthetic import generate_synthetic
    from projected_lmc_tpu.experiments.driver import build_models

    data = generate_synthetic(n=500, p=100, q=25, q_noise=25, mu_noise=0.1,
                              mu_str=0.9, n_test=2500, seed=0)
    jm = build_models(data["X"], data["Y"], 25, 100, ["var"], seed=0)["var"]
    assert jm.whitened and jm.distrib == "cholesky"

    X = torch.as_tensor(np.asarray(data["X"], np.float64))
    Y = torch.as_tensor(np.asarray(data["Y"], np.float64))
    Xt = torch.as_tensor(np.asarray(data["X_test"], np.float64))
    Yt = torch.as_tensor(np.asarray(data["Y_test"], np.float64))
    n, p = Y.shape
    q = jm.n_latents

    # --- transfer the EXACT initial state (fp32 values, fp64 training) ----
    raw_ls = inv_softplus(jm.covar_module.lengthscale).clone(
        ).requires_grad_(True)                             # (q, 1, d)
    Z = torch.as_tensor(np.asarray(jm.inducing_points, np.float64)
                        ).clone().requires_grad_(True)     # (m, d)
    H = torch.as_tensor(np.asarray(jm.lmc_coeffs, np.float64)
                        ).clone().requires_grad_(True)     # (q, p)
    vm = torch.as_tensor(np.asarray(jm.var_mean, np.float64)
                         ).clone().requires_grad_(True)    # (q, m)
    vc = torch.as_tensor(np.asarray(jm.var_chol, np.float64)
                         ).clone().requires_grad_(True)    # (q, m, m)
    F = torch.as_tensor(np.asarray(jm.likelihood.task_noise_covar_factor,
                                   np.float64)).clone().requires_grad_(True)
    raw_gn = torch.zeros(1, requires_grad=True)   # GreaterThan(1e-4)
    m_ind = Z.shape[0]

    def task_cov():
        return F @ F.T + (softplus(raw_gn) + 1e-4) * torch.eye(p)

    def elbo():
        ls = softplus(raw_ls)
        Kzz = matern25(Z, Z, ls)                           # (q, m, m)
        Lzz = chol_ladder(Kzz)
        Kxz = matern25(X, Z, ls)                           # (q, n, m)
        A = torch.linalg.solve_triangular(
            Lzz, Kxz.transpose(-1, -2), upper=False).transpose(-1, -2)
        S_chol = torch.tril(vc)
        mean_l = (A @ vm[..., None])[..., 0]               # (q, n)
        AS = A @ S_chol
        var_l = (1.0 - (A * A).sum(-1) + (AS * AS).sum(-1)).clamp_min(1e-12)
        mean = mean_l.T @ H                                # (n, p)
        delta = Y - mean
        St = task_cov()
        Rt = torch.linalg.cholesky(St)
        z = torch.linalg.solve_triangular(Rt, delta.T, upper=False)
        quad = (z * z).sum()
        logdet = 2.0 * torch.log(torch.diagonal(Rt)).sum()
        SinvW = torch.cholesky_solve(H.T, Rt)              # (p, q)
        wsw = (H.T * SinvW).sum(0)                         # (q,)
        trace = (var_l * wsw[:, None]).sum()
        exp_ll = -0.5 * (quad + trace + n * (logdet + p * math.log(2 * math.pi)))
        diag = torch.diagonal(S_chol, dim1=-2, dim2=-1)
        kl = 0.5 * ((S_chol ** 2).sum() + (vm ** 2).sum()
                    - q * m_ind - torch.log(diag ** 2).sum())
        return (exp_ll - kl) / n

    params = [raw_ls, Z, H, vm, vc, F, raw_gn]
    if args.seed:
        g = torch.Generator().manual_seed(args.seed)
        with torch.no_grad():
            for prm in params:
                prm.add_(1e-4 * (prm.abs() + 1e-3)
                         * torch.randn(prm.shape, generator=g))
    opt = torch.optim.AdamW(params, lr=args.lr)
    last_epoch = 10000
    sched = torch.optim.lr_scheduler.LambdaLR(
        opt, lambda i: (i / last_epoch * 0.1 + (last_epoch - i) / last_epoch)
        if i <= last_epoch else 0.1)

    start_iter, prev_traj, prev_r2s, wall_offset = 0, [], {}, 0.0
    if args.state and os.path.exists(args.state):
        ck = torch.load(args.state, weights_only=False)
        with torch.no_grad():
            for prm, saved in zip(params, ck["params"]):
                prm.copy_(saved)
        opt.load_state_dict(ck["opt"])
        sched.load_state_dict(ck["sched"])
        start_iter = ck["iter"]
        prev_traj, prev_r2s = ck["traj"], ck["r2s"]
        wall_offset = ck.get("wall_s", 0.0)
        print(f"[resume] {args.state} at iter {start_iter}", flush=True)

    def test_R2():
        with torch.no_grad():
            ls = softplus(raw_ls)
            Kzz = matern25(Z, Z, ls)
            Lzz = chol_ladder(Kzz)
            Kxz = matern25(Xt, Z, ls)
            A = torch.linalg.solve_triangular(
                Lzz, Kxz.transpose(-1, -2), upper=False).transpose(-1, -2)
            mean = (A @ vm[..., None])[..., 0].T @ H
            err2 = (Yt - mean) ** 2
            return float((1 - err2.mean(0) / Yt.var(0)).mean())

    traj, r2s = prev_traj, prev_r2s
    t0 = time.time()

    def wall():
        return round(wall_offset + time.time() - t0, 1)

    def dump(i, steps_done=None):
        """i labels the JSON checkpoint (loop index, unchanged vs committed
        artifacts); steps_done is the COUNT of optimizer steps completed —
        the in-loop dump fires after step i, so steps_done=i+1 there while
        the post-loop dump passes n_iter. The state's `iter` stores
        steps_done so resume (start_iter=ck['iter']) never replays a step
        (advisor r4 medium: the old iter=i convention re-executed step i —
        one extra Adam+scheduler step and a duplicate traj entry per
        resume)."""
        if steps_done is None:
            steps_done = i
        out = dict(
            config=dict(n=n, p=p, q=q, m=m_ind, lik_rank=p,
                        jax_init_loss=568.46, seed=args.seed),
            iters_done=steps_done,
            neg_elbo_every10=traj,
            test_R2_checkpoints=r2s,
            mean_noise=round(float(torch.diagonal(task_cov()).mean()), 4),
            wall_s=wall(),
        )
        os.makedirs(os.path.dirname(args.out) or ".", exist_ok=True)
        with open(args.out, "w") as f:
            json.dump(out, f)
        if args.state:
            with torch.no_grad():
                torch.save(dict(params=[prm.detach().clone()
                                        for prm in params],
                                opt=opt.state_dict(),
                                sched=sched.state_dict(), iter=steps_done,
                                traj=traj, r2s=r2s, wall_s=wall()),
                           args.state + ".tmp")
            os.replace(args.state + ".tmp", args.state)

    for i in range(start_iter, args.n_iter):
        opt.zero_grad()
        loss = -elbo()
        loss.backward()
        opt.step()
        sched.step()
        if i % 10 == 0:
            traj.append(round(float(loss), 5))
        if i % args.checkpoint_every == 0:
            r2s[str(i)] = round(test_R2(), 4)
            dump(i, steps_done=i + 1)
            print(f"iter {i}: -elbo/n {float(loss):.4f} R2 {r2s[str(i)]:.4f} "
                  f"noise {float(torch.diagonal(task_cov()).mean()):.3f} "
                  f"({time.time()-t0:.0f}s)", flush=True)

    r2s[str(args.n_iter)] = round(test_R2(), 4)
    dump(args.n_iter)
    print(json.dumps(dict(final_loss=traj[-1], R2=r2s[str(args.n_iter)],
                          wall_s=round(time.time() - t0, 1)), indent=1))


if __name__ == "__main__":
    main()
