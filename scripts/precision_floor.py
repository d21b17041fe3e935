#!/usr/bin/env python
"""The low-precision matvec floor, as a reproducible artifact.

Trains the same exact-LMC model (n=512, T=7, q=4, Matérn, AdamW 1e-2,
300 steps) under four estimator configurations —

  * fp32   — fp32 CG matvecs (the reference precision),
  * bf16   — bf16 kernel stack (the bench default),
  * int8   — int8-quantized stack (opt-in),
  * two_phase — fit_two_phase: bf16 for 70% of the budget, fp32 refine —

and evaluates every endpoint with a common tight fp32 yardstick.  Writes
results/precision_floor.json.  Backs the "precision floor" section of
results/PERF_NOTES.md and the fit_two_phase guidance; CPU-runnable
(~10 min) so the experiment is verifiable without a TPU.
"""

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main(n=512, t=7, q=4, d=4, steps=300, seed=0,
         out="results/precision_floor.json"):
    import jax
    import jax.numpy as jnp  # noqa: F401
    from projected_lmc_tpu.models.multitask import MultitaskGPModel
    from projected_lmc_tpu.likelihoods import MultitaskGaussianLikelihood
    from projected_lmc_tpu.training import fit, fit_two_phase

    rng = np.random.default_rng(seed)
    X = rng.uniform(-1, 1, (n, d)).astype(np.float32)
    ls_true = np.array([0.4, 0.6, 0.9, 1.3])[:q]
    U = np.stack([np.sin(X @ (1.0 / l * np.ones(d)) * 2) for l in ls_true], 1)
    H = rng.standard_normal((q, t))
    Y = (U @ H + 0.1 * rng.standard_normal((n, t))).astype(np.float32)

    def make():
        lik = MultitaskGaussianLikelihood(num_tasks=t, rank=0)
        return MultitaskGPModel(X, Y, lik, n_tasks=t, n_latents=q,
                                model_type="LMC", kernel_type="matern",
                                mean_type="zero", fix_diagonal=True, seed=0)

    base = dict(iterative=True, max_cg_iters=16, cg_tol=2e-2,
                precond_rank=64, num_probes=8)

    def loss_for(mode):
        extra = ({"matvec_bf16": True} if mode == "bf16"
                 else {"matvec_int8": True} if mode == "int8" else {})
        return lambda m, key: m.mll(key=key, **base, **extra)

    fine = lambda m, key: m.mll(key=key, iterative=True, max_cg_iters=64,
                                cg_tol=1e-5, precond_rank=64, num_probes=8)

    kw = dict(lr=1e-2, patience=10_000, scan_steps=16)
    yard = dict(iterative=True, max_cg_iters=400, cg_tol=1e-10,
                precond_rank=128, num_probes=8)

    results = {}
    for mode in ("fp32", "bf16", "int8"):
        m, info = fit(make(), loss_for(mode), n_iter=steps, **kw)
        final = float(m.mll(key=jax.random.PRNGKey(7), **yard))
        ls_l = np.asarray(jax.nn.softplus(
            m.covar_module.raw_lengthscale)).ravel().tolist()
        results[mode] = dict(final_exact_mll=final, lengthscales=ls_l,
                             train_time=float(info["train_time"]))
        print(mode, round(final, 5), flush=True)

    m2, info2 = fit_two_phase(make(), loss_for("bf16"), fine, n_iter=steps,
                              fine_frac=0.3, **kw)
    final2 = float(m2.mll(key=jax.random.PRNGKey(7), **yard))
    results["two_phase_bf16_fp32"] = dict(
        final_exact_mll=final2,
        lengthscales=np.asarray(jax.nn.softplus(
            m2.covar_module.raw_lengthscale)).ravel().tolist(),
        train_time=float(info2["train_time"]))
    print("two_phase", round(final2, 5), flush=True)

    payload = dict(
        config=dict(n=n, T=t, q=q, d=d, steps=steps, seed=seed,
                    estimator=base, yardstick=yard),
        results=results,
        summary=dict(
            floor_gap_bf16=results["bf16"]["final_exact_mll"]
            - results["fp32"]["final_exact_mll"],
            floor_gap_int8=results["int8"]["final_exact_mll"]
            - results["fp32"]["final_exact_mll"],
            two_phase_recovers=final2
            - results["bf16"]["final_exact_mll"]),
    )
    os.makedirs(os.path.dirname(out), exist_ok=True)
    with open(out, "w") as f:
        json.dump(payload, f, indent=1)
    print(json.dumps(payload["summary"], indent=1))
    print(f"wrote {out}")


if __name__ == "__main__":
    main()
