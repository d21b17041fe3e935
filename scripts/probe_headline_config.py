#!/usr/bin/env python
"""Step-level probe of the n=10k exact-LMC headline config (VERDICT r4
item 8: "one more step-level pass at n=10k for the ~6% to 50 it/s —
re-measure rank-192/256 and scan-chunk size at the current code state").

Grid: scan-chunk steps x Nystrom preconditioner rank, same fused-PCG MLL
step as bench.bench_exact_lmc (max_cg_iters=16, cg_tol=2e-2, bf16 matvec,
8 probes). The preconditioner roots are rebuilt once per scan chunk
(~13%% of a steps=8 chunk on a v5e), so larger chunks amortize the build:
steps=16 halves that overhead at the cost of a staler preconditioner
(which, with a fixed CG iteration count, shifts solve error rather than
time). Accuracy context for chunk-size changes: the fused estimator is
exact for any SPD preconditioner, and results/trajectory_overlay.json
validates the bench config's trajectory at steps=8.

Run SOLO (one tunnel claim): python scripts/probe_headline_config.py
Writes results/probe_headline_config.json.
"""

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def probe(n=10000, T=7, q=4, steps=8, rank=256, reps=2, measurements=3,
          seed=0):
    import jax
    import optax

    from projected_lmc_tpu.likelihoods import MultitaskGaussianLikelihood
    from projected_lmc_tpu.models.multitask import MultitaskGPModel
    from projected_lmc_tpu.module import combine, partition, trainable_mask

    rng = np.random.default_rng(seed)
    X = rng.standard_normal((n, 4)).astype(np.float32)
    Y = rng.standard_normal((n, T)).astype(np.float32)
    lik = MultitaskGaussianLikelihood(num_tasks=T, rank=0)
    model = MultitaskGPModel(X, Y, lik, n_tasks=T, n_latents=q,
                             model_type="LMC", kernel_type="matern",
                             mean_type="zero", fix_diagonal=True)
    mask = trainable_mask(model)
    params, static = partition(model, mask)
    tx = optax.adamw(1e-2)
    opt_state = tx.init(params)

    @jax.jit
    def multi_step(carry):
        p0, _, _ = carry
        roots = jax.lax.stop_gradient(
            combine(p0, static)._precond_roots(
                combine(p0, static).train_x, rank))

        def body(c, _):
            p, o, k = c
            k, sub = jax.random.split(k)

            def neg_loss(pp):
                return -combine(pp, static).mll(
                    key=sub, max_cg_iters=16, cg_tol=2e-2, matvec_bf16=True,
                    precond_rank=rank, num_probes=8, precond_roots=roots)

            loss, grads = jax.value_and_grad(neg_loss)(p)
            updates, o = tx.update(grads, o, p)
            p = optax.apply_updates(p, updates)
            return (p, o, k), loss

        carry, _ = jax.lax.scan(body, carry, None, length=steps)
        return carry

    def _sync(v):
        float(np.asarray(jax.tree_util.tree_leaves(v)[0].ravel()[0]))

    state = (params, opt_state, jax.random.PRNGKey(0))
    t0 = time.time()
    state = multi_step(state)
    _sync(state)
    compile_s = time.time() - t0
    vals = []
    for _ in range(measurements):
        t0 = time.time()
        for _ in range(reps):
            state = multi_step(state)
        _sync(state)
        vals.append(steps * reps / (time.time() - t0))
    return dict(steps=steps, rank=rank, compile_s=round(compile_s, 1),
                iters_per_sec=[round(v, 2) for v in vals],
                median=round(float(np.median(vals)), 2))


def main():
    from projected_lmc_tpu.utils.tpu import ensure_tpu
    ensure_tpu()
    out = {"config": "n=10000 T=7 q=4 fused-PCG bf16 headline step",
           "grid": []}
    # steps=8/rank=256 is the shipped bench config (measured first as the
    # in-session control); the rest probe the two verdict-named knobs.
    for steps, rank in [(8, 256), (16, 256), (32, 256), (8, 192), (16, 192)]:
        r = probe(steps=steps, rank=rank)
        out["grid"].append(r)
        print(json.dumps(r), flush=True)
    with open("results/probe_headline_config.json", "w") as f:
        json.dump(out, f, indent=1)
    print("wrote results/probe_headline_config.json")


if __name__ == "__main__":
    main()
