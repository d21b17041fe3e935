#!/usr/bin/env python
"""JAX-side full-B̃ PLMC training trajectory on the default synthetic config
— the companion measurement to scripts/oracle_plmc_synthetic.py (VERDICT r4
item 1). Same data (generate_synthetic seed 0, whose op-order torch mirror
the oracle consumes), same recipe (AdamW 1e-2, LambdaLR linear→1e-3 over
10k, experiments.py:84,256-284), test-R² recorded every --r2-every
iterations via fit()'s eval hook, incremental JSON checkpoints.

The question this answers: where torch-fp64 holds/loses test R² over the
horizon, does the JAX trajectory sit on it? (The round-3 narrative — R²
0.980 @2.5k → 0.938 @40k — was JAX-only evidence.)
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np  # noqa: E402


def main(argv=None):
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--n-iter", type=int, default=40000)
    ap.add_argument("--r2-every", type=int, default=500)
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--scan-steps", type=int, default=None)
    ap.add_argument("--matmul-precision", default=None,
                    choices=["default", "high", "highest"],
                    help="jax_default_matmul_precision override — on TPU the "
                         "default is bf16-grade passes; 'highest' isolates "
                         "whether the R2 decline is matmul-precision noise "
                         "(QR of H runs every step inside jit)")
    ap.add_argument("--x64", action="store_true",
                    help="fp64 (CPU) — the precision-ladder top rung, "
                         "comparable to the torch-fp64 oracle")
    ap.add_argument("--noise-thresh", type=float, default=None,
                    help="override the projected-noise floor exp(thresh) "
                         "(reference default −9, projected_lmc.py:920-921). "
                         "Mitigation probe for the >30k fp32 runaway: the "
                         "anatomy shows sigma_p PINNED at exp(−9) while "
                         "‖M‖_F grows — (sigma_p, M) enter the training "
                         "objective only as the product sigma_p·M "
                         "(project_data cross term), so the floor creates "
                         "the degenerate direction the runaway rides")
    ap.add_argument("--out", default="results/plmc_trajectory_jax.json")
    args = ap.parse_args(argv)

    import jax
    if args.matmul_precision:
        jax.config.update("jax_default_matmul_precision",
                          args.matmul_precision)
    if args.x64:
        # fp64 needs the CPU backend; the sitecustomize eagerly registers the
        # tunneled TPU, so JAX_PLATFORMS is too late — force + reset caches
        # (same trick as tests/conftest.py)
        jax.config.update("jax_enable_x64", True)
        jax.config.update("jax_platforms", "cpu")
        if jax.default_backend() != "cpu":
            from jax._src import xla_bridge as _xb
            _xb._clear_backends()
            _xb.get_backend.cache_clear()
        assert jax.default_backend() == "cpu", jax.default_backend()
    else:
        from projected_lmc_tpu.utils.tpu import ensure_tpu
        ensure_tpu()
    from projected_lmc_tpu.experiments.driver import (DEFAULT_PARAMS,
                                                      build_models)
    from projected_lmc_tpu.experiments.synthetic import generate_synthetic
    from projected_lmc_tpu.mlls import projected_lmc_mll
    from projected_lmc_tpu.training import fit, lambda_lr_schedule

    v = dict(DEFAULT_PARAMS)
    data = generate_synthetic(
        n=v["n"], p=v["p"], q=v["q"], q_noise=v["q_noise"],
        mu_noise=v["mu_noise"], mu_str=v["mu_str"], max_scale=v["max_scale"],
        n_test=2500, seed=args.seed)
    if args.noise_thresh is not None:
        from projected_lmc_tpu.experiments.driver import MODEL_CONFIGS
        from projected_lmc_tpu.models.projected import ProjectedGPModel
        model = ProjectedGPModel(
            data["X"], data["Y"], v["p"], v["q"], proj_likelihood=None,
            init_lmc_coeffs=True, mean_type="zero", kernel_type="matern",
            noise_thresh=args.noise_thresh, seed=args.seed,
            **MODEL_CONFIGS["PLMC"])
    else:
        model = build_models(data["X"], data["Y"], v["q"], v["p"], ["PLMC"],
                             seed=args.seed)["PLMC"]
    Yt = np.asarray(data["Y_test"], np.float64)
    var_t = Yt.var(axis=0, ddof=1)

    state = dict(config=dict(n=v["n"], p=v["p"], q=v["q"],
                             n_iter=args.n_iter, seed=args.seed,
                             model="PLMC full-B_tilde (JAX)",
                             matmul_precision=args.matmul_precision
                             or "default",
                             x64=bool(args.x64),
                             noise_thresh=args.noise_thresh,
                             backend=jax.default_backend()),
                 r2_trajectory=[], loss_checkpoints=[])
    t0 = time.time()

    def eval_fn(m, i):
        mean, _ = m.predict(data["X_test"], observed=True)
        err2 = (Yt - np.asarray(mean, np.float64)) ** 2
        r2 = float((1.0 - err2.mean(0) / var_t).mean())
        state["r2_trajectory"].append([int(i), round(r2, 6)])
        # parameter anatomy at each checkpoint — the R² transition is a
        # discrete event (results/plmc_trajectory_jax_highest.json: stable
        # 0.978 through 14.5k, then a drop to 0.916 in <2k iters); these
        # localize WHICH parameter moves when it happens
        Q, R, Qo = m.lmc_coefficients.QR()
        Q = np.asarray(Q, np.float64)
        sig = np.asarray(m.projected_noise(), np.float64)
        diag = dict(
            loss=round(float(projected_lmc_mll(m)), 6),
            sigma_p_min=float(sig.min()), sigma_p_max=float(sig.max()),
            H_fro=round(float(np.linalg.norm(
                np.asarray(m.lmc_coefficients.H, np.float64))), 4),
            R_diag_min=float(np.abs(np.diagonal(
                np.asarray(R, np.float64))).min()),
            ortho_err=float(np.abs(Q.T @ Q - np.eye(Q.shape[1])).max()))
        if m.B_mode == "full":
            Bd = np.diagonal(np.asarray(m.B_tilde_inv_chol_raw, np.float64))
            diag.update(Braw_diag_min=float(Bd.min()),
                        Braw_diag_max=float(Bd.max()))
        if not m.BDN:
            diag["M_fro"] = round(float(np.linalg.norm(
                np.asarray(m.M, np.float64))), 4)
        state.setdefault("param_diag", []).append([int(i), diag])
        with open(args.out + ".tmp", "w") as f:
            json.dump(state, f, indent=1)
        os.replace(args.out + ".tmp", args.out)
        print(f"iter {i}: R2 {r2:.4f} ({time.time() - t0:.0f}s)",
              flush=True)
        return r2

    model_t, info = fit(
        model, projected_lmc_mll, n_iter=args.n_iter, lr=1e-2,
        schedule=lambda_lr_schedule(lr_max=1e-2, lr_min=1e-3),
        scan_steps=args.scan_steps, eval_every=args.r2_every,
        eval_fn=eval_fn)

    losses = np.asarray(info["losses"])
    state["loss_checkpoints"] = [
        [int(i), float(losses[min(i, len(losses) - 1)])]
        for i in range(0, len(losses), args.r2_every)]
    state["final_loss"] = float(losses[-1])
    state["effective_n_iter"] = int(info["n_iter"])
    state["train_time_s"] = round(info["train_time"], 1)
    state["final_R2"] = state["r2_trajectory"][-1][1]
    with open(args.out + ".tmp", "w") as f:
        json.dump(state, f, indent=1)
    os.replace(args.out + ".tmp", args.out)
    print(json.dumps({k: state[k] for k in
                      ("final_R2", "final_loss", "effective_n_iter",
                       "train_time_s")}))
    return 0


if __name__ == "__main__":
    sys.exit(main())
