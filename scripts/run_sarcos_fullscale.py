"""Full-SARCOS-scale projected-LMC training on one TPU chip.

The driver north star (BASELINE.md, rebuild-targets row 2) asks for projected
LMC training end-to-end on the FULL SARCOS problem size — 44,484 training
points, 21 joint dims, 7 torque outputs, 500 inducing points
(realdata_experiments.py:503-517 uses these shapes at ndiv=1). The reference
repo's snapshot ships only `sarcos_inv_test.mat` (4,449 rows); the 44k train
file is absent. This script therefore demonstrates the full-scale capability
on a SARCOS-shaped SURROGATE with known ground truth — 7 smooth latent GP
functions of 21 inputs (Nystrom-feature construction), mixed by a random
(7, 7) matrix plus heteroskedastic noise — and reports accuracy against the
noiseless truth on a held-out 4,449-point split. The real-data counterpart
(available split) lives in `scripts/run_realdata.py sarcos`.

Run:  python scripts/run_sarcos_fullscale.py [--n-iter 3000] [--models PLMC_fast ...]
Writes results/sarcos_fullscale_synthetic.csv (reference CSV schema).
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

N_TRAIN, N_TEST, D, T, Q = 44484, 4449, 21, 7, 7
NOISE = 0.1

VARIANTS = {
    # experiments.py:196-216 variant configs
    "PLMC": dict(BDN=False, diagonal_B=False, scalar_B=False),
    "PLMC_fast": dict(BDN=True, scalar_B=True, diagonal_B=False),
    "oilmm": dict(BDN=True, diagonal_B=True, scalar_B=True, diagonal_R=True,
                  bulk=False),
}


def make_surrogate(seed=0, m_feat=512, lengthscale=2.5):
    """SARCOS-shaped multitask data: latents u_b(x) = k(x, Z) w_b with a
    Matern-like RBF feature map — smooth GP-style functions evaluable at 49k
    points without a 49k x 49k factorization."""
    rng = np.random.default_rng(seed)
    X = rng.standard_normal((N_TRAIN + N_TEST, D)).astype(np.float32)
    Z = rng.standard_normal((m_feat, D)).astype(np.float32)
    d2 = ((X**2).sum(-1)[:, None] + (Z**2).sum(-1)[None, :]
          - 2.0 * X @ Z.T)                          # (n, m) — no 3-D temp
    Phi = np.exp(-0.5 * np.maximum(d2, 0.0) / lengthscale**2)
    W = rng.standard_normal((m_feat, Q)).astype(np.float32) / np.sqrt(m_feat)
    U = Phi @ W                                     # (n, Q) smooth latents
    U /= U.std(axis=0)
    H = rng.standard_normal((Q, T)).astype(np.float32)
    F = U @ H                                       # noiseless tasks
    Y = F + NOISE * rng.standard_normal(F.shape).astype(np.float32)
    idx = rng.permutation(len(X))
    tr, te = idx[:N_TRAIN], idx[N_TRAIN:]
    return (X[tr], Y[tr]), (X[te], Y[te], F[te])


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n-iter", type=int, default=3000)
    ap.add_argument("--m-ind", type=int, default=500)
    ap.add_argument("--models", nargs="+", default=["PLMC_fast"],
                    choices=list(VARIANTS))
    ap.add_argument("--out", default="results/sarcos_fullscale_synthetic.csv")
    args = ap.parse_args()

    os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/repo/.jax_cache")
    os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "5")
    import jax
    import jax.numpy as jnp
    from projected_lmc_tpu.models.projected import ProjectedGPModel
    from projected_lmc_tpu.mlls import projected_lmc_mll
    from projected_lmc_tpu.training import fit
    from projected_lmc_tpu.metrics import compute_metrics

    (Xtr, Ytr), (Xte, Yte, Fte) = make_surrogate()
    print(f"surrogate: train {Xtr.shape}, test {Xte.shape}, "
          f"backend {jax.default_backend()}")

    rows = {}
    for name in args.models:
        cfg = VARIANTS[name]
        model = ProjectedGPModel(Xtr, Ytr, T, Q, init_lmc_coeffs=True,
                                 kernel_type="matern",
                                 n_inducing_points=args.m_ind, **cfg)
        t0 = time.time()
        model, info = fit(model, projected_lmc_mll, n_iter=args.n_iter,
                          lr=1e-2, loss_thresh=1e-7, patience=300)
        train_time = time.time() - t0
        t0 = time.time()
        predict = jax.jit(lambda m, x: m.predict(x, observed=True))
        mean, var = predict(model, jnp.asarray(Xte))
        mean = np.asarray(jax.block_until_ready(mean))
        sigma = np.sqrt(np.asarray(var))
        pred_time = time.time() - t0
        it_per_s = info["n_iter"] / train_time
        print(f"\n== {name}: {info['n_iter']} iters in {train_time:.1f}s "
              f"({it_per_s:.1f} it/s), predict {pred_time*1e3:.0f} ms")
        m = compute_metrics(Yte, mean, sigma, loss=-float(np.asarray(info['losses'])[info['n_iter']-1]),
                            H_guess_hid=np.zeros((1, T)), n_iter=info["n_iter"],
                            train_time=train_time, pred_time=pred_time)
        # accuracy against the NOISELESS truth (surrogate advantage)
        m["R2_vs_truth"] = float(1 - ((mean - Fte) ** 2).mean()
                                 / Fte.var(axis=0).mean())
        m["iters_per_sec"] = it_per_s
        m["model"] = name
        rows[name] = m
        print(f"   R2 vs noiseless truth: {m['R2_vs_truth']:.4f}")

    import pandas as pd
    os.makedirs(os.path.dirname(args.out), exist_ok=True)
    pd.DataFrame(rows).T.to_csv(args.out)
    print(f"\nwrote {args.out}")


if __name__ == "__main__":
    main()
