#!/usr/bin/env python
"""Phase-level on-chip profile of the exact-LMC bench step (bench.py config).

Times each phase of the n=10k training step separately — kernel-stack build
(XLA vs Pallas, fp32 vs bf16-out), preconditioner construction, one CG
matvec, the fused PCG MLL forward, and the full value_and_grad + AdamW step —
dispatching several dependent iterations per fetch (the tunneled TPU adds
~25 ms per host fetch). This is the measurement basis for the perf work in
results/PERF_NOTES.md.

Run SOLO (one tunnel claim): python scripts/profile_step.py [n]
"""

import json
import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")


def main(n=10000, T=7, q=4, d=4, reps=6):
    from projected_lmc_tpu.utils.tpu import ensure_tpu
    ensure_tpu()
    import jax
    import jax.numpy as jnp
    from projected_lmc_tpu.models.multitask import MultitaskGPModel
    from projected_lmc_tpu.likelihoods import MultitaskGaussianLikelihood
    from projected_lmc_tpu.module import trainable_mask, partition, combine
    from projected_lmc_tpu.ops import iterative as it_ops
    import optax

    assert jax.default_backend() == "tpu"
    out = {"n": n, "T": T, "q": q}

    rng = np.random.default_rng(0)
    X = rng.standard_normal((n, d)).astype(np.float32)
    Y = rng.standard_normal((n, T)).astype(np.float32)
    lik = MultitaskGaussianLikelihood(num_tasks=T, rank=0)
    model = MultitaskGPModel(X, Y, lik, n_tasks=T, n_latents=q,
                             model_type="LMC", kernel_type="matern",
                             mean_type="zero", fix_diagonal=True)
    Xd = jnp.asarray(X)

    def _sync(v):
        float(jnp.sum(jax.tree_util.tree_leaves(v)[0].ravel()[0]))

    def timed_chain(make_step, init, label, *args):
        """jit a chain of `reps` dependent steps, fetch once. Large operands
        must come through *args (a closure-captured array is baked into the
        compile payload — the tunneled remote compiler rejects >~100 MB)."""
        @jax.jit
        def chain(v, *a):
            for _ in range(reps):
                v = make_step(v, *a)
            return v
        v = chain(init, *args)
        _sync(v)
        t0 = time.time()
        v = chain(v, *args)
        _sync(v)
        ms = (time.time() - t0) / reps * 1e3
        out[label] = round(ms, 3)
        print(label, round(ms, 3), flush=True)
        return ms

    cm = model.covar_module

    # 1. kernel-stack builds
    timed_chain(lambda v, x: v + 0.0 * cm(x + 0.0 * v[0, 0])[0, 0, 0],
                jnp.zeros((1, 1)), "build_fp32_default_ms", Xd)
    timed_chain(lambda v, x: v + 0.0 * cm(
        x + 0.0 * v[0, 0], out_dtype=jnp.bfloat16)[0, 0, 0].astype(jnp.float32),
        jnp.zeros((1, 1)), "build_bf16_default_ms", Xd)
    cm_noplas = cm.replace(use_pallas=False) if hasattr(cm, "use_pallas") else cm
    timed_chain(lambda v, x: v + 0.0 * cm_noplas(
        x + 0.0 * v[0, 0], out_dtype=jnp.bfloat16)[0, 0, 0].astype(jnp.float32),
        jnp.zeros((1, 1)), "build_bf16_xla_ms", Xd)

    # 2. one bf16 matvec over 9 RHS (bench probe count 8 + target)
    Ks16 = cm(Xd, out_dtype=jnp.bfloat16)
    H = model.covar_factor[..., 0].T
    St = lik.task_covariance() + jnp.diag(model._lmc_extra_diag())
    V0 = jnp.asarray(rng.standard_normal((9, n, T)).astype(np.float32))
    timed_chain(lambda v, K: it_ops.lmc_matvec(K, H, St, v), V0,
                "matvec_bf16_9rhs_ms", Ks16)

    # 3. preconditioner roots construction (rank 256)
    timed_chain(lambda v, x: v + 0.0 * model._precond_roots(
        x + 0.0 * v[0, 0], 256)[0, 0, 0], jnp.zeros((1, 1)),
        "precond_roots_ms", Xd)

    # 4. MLL forward only (bench hyperparameters)
    mask = trainable_mask(model)
    params, static = partition(model, mask)

    def mll(p, key):
        return combine(p, static).mll(key=key, iterative=True,
                                      max_cg_iters=16, cg_tol=2e-2,
                                      matvec_bf16=True, precond_rank=256,
                                      num_probes=8)

    @jax.jit
    def fwd_chain(p, key):
        acc = 0.0
        for i in range(reps):
            key, sub = jax.random.split(key)
            acc = acc + mll(jax.tree_util.tree_map(
                lambda x: x + 0.0 * acc if x.dtype == jnp.float32 else x, p), sub)
        return acc
    v = fwd_chain(params, jax.random.PRNGKey(0))
    _sync(v)
    t0 = time.time()
    v = fwd_chain(params, jax.random.PRNGKey(1))
    _sync(v)
    out["mll_forward_ms"] = round((time.time() - t0) / reps * 1e3, 3)

    # 5. full training step (value_and_grad + AdamW), scan-fused like bench
    tx = optax.adamw(1e-2)
    opt_state = tx.init(params)

    @jax.jit
    def multi_step(carry):
        p0, _, _ = carry
        roots = jax.lax.stop_gradient(
            combine(p0, static)._precond_roots(
                combine(p0, static).train_x, 256))

        def mll_r(p, key):
            return combine(p, static).mll(key=key, iterative=True,
                                          max_cg_iters=16, cg_tol=2e-2,
                                          matvec_bf16=True, precond_rank=256,
                                          num_probes=8, precond_roots=roots)

        def body(c, _):
            p, o, k = c
            k, sub = jax.random.split(k)
            loss, grads = jax.value_and_grad(
                lambda pp: -mll_r(pp, sub))(p)
            updates, o = tx.update(grads, o, p)
            p = optax.apply_updates(p, updates)
            return (p, o, k), loss
        carry, losses = jax.lax.scan(body, carry, None, length=8)
        return carry

    state = (params, opt_state, jax.random.PRNGKey(0))
    state = multi_step(state)
    _sync(state)
    t0 = time.time()
    for _ in range(2):
        state = multi_step(state)
    _sync(state)
    step_ms = (time.time() - t0) / 16 * 1e3
    out["full_step_ms"] = round(step_ms, 3)
    out["iters_per_sec"] = round(1e3 / step_ms, 2)

    print(json.dumps(out, indent=2))
    with open("/tmp/profile_step.json", "w") as f:
        json.dump(out, f)


if __name__ == "__main__":
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 10000
    main(n=n)
