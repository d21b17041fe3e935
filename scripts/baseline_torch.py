"""Measured gpytorch-equivalent baseline: eager-torch exact-LMC training step.

The driver north star is ">10x A100 gpytorch step throughput" for the exact
LMC MLL at n=10k, T=7 (BASELINE.md). The reference repo publishes no number
and gpytorch is not installed here, so this script measures a from-scratch
eager-torch implementation of the SAME estimator gpytorch 1.11 runs for this
model (reference call path projected_lmc.py:586-589 -> gpytorch
ExactMarginalLogLikelihood -> linear_operator inv_quad_logdet):

  * dense Matern-2.5 kernel per latent, built eagerly every step (gpytorch's
    LazyEvaluatedKernelTensor materializes the base kernels for the matvecs);
  * batched preconditioner-free CG on [y, z_1..z_s] (s = 10 Hutchinson probes,
    gpytorch num_trace_samples default; sum-of-Kronecker lazies have no
    pivoted-Cholesky preconditioner in gpytorch, _solve falls back to plain
    CG), training tolerance 1.0, max 1000 iterations (gpytorch defaults);
  * logdet from the Lanczos tridiagonals recovered from the CG alpha/beta
    coefficients (linear_operator's inv_quad_logdet trick — zero extra
    matvecs);
  * backward reusing the saved solves with the standard identities
    d(-1/2 y'S^-1 y)/dS = 1/2 aa', d(-1/2 logdet S)/dS ~ -(1/4s) sum_i
    (w_i z_i' + z_i w_i') — exactly linear_operator's InvQuadLogdet.backward;
  * AdamW step on lengthscales, mixing matrix, task noises (eager autograd
    through the kernel build, implicit-function gradients through the solve,
    as in gpytorch).

This implementation is *leaner* than real gpytorch (no LazyTensor dispatch
overhead, no per-op Python broadcasting machinery), so its throughput is an
UPPER bound on gpytorch's at equal hardware.

A100 extrapolation (documented; also written to results/baseline_torch.json).
This container exposes ONE CPU core, so naive hardware-ratio scaling of the
measured step time is meaningless (the ratio to an A100 exceeds 2000x and
overshoots physics). Instead:

  1. the script builds an analytic per-phase cost LEDGER of the eager op
     sequence — (flops, bytes-moved, op-launch count) for kernel build, CG,
     and backward — from the run's actual shapes and iteration counts;
  2. the ledger is VALIDATED against this host: predicted phase times from
     the host's measured GEMM TFLOP/s and stream GB/s are compared with the
     measured phase times (reported as `host_model_ratio`, ~1 means the
     ledger captures the work);
  3. the same ledger is priced at A100 rates — fp32 peak 19.5 TFLOP/s (TF32
     is disabled by the reference, realdata_experiments.py:6), HBM
     2.0 TB/s, both derated to 80% attainable, plus 5 us per eager CUDA op
     launch (measured envelope for eager torch) — giving
     `a100_gpytorch_iters_per_sec_est`.

The estimate deliberately favors the baseline: it assumes gpytorch reaches
80% of peak on every op and pays nothing for LazyTensor dispatch, Python
control flow, or allocator traffic beyond the 5 us/op launch floor.

Usage:  python scripts/baseline_torch.py [--n 10000] [--steps 3] [--quick]
Writes results/baseline_torch.json with every measured quantity and the
derived `a100_gpytorch_iters_per_sec_est` that bench.py consumes.
"""

import argparse
import json
import math
import os
import time

import numpy as np
import torch

torch.set_num_threads(os.cpu_count() or 8)

SQRT5 = math.sqrt(5.0)


def matern25_stack(X, log_ls):
    """(q, n, n) Matern-2.5 kernel stack, ARD lengthscales exp(log_ls) (q, d)."""
    ls = torch.exp(log_ls)                                   # (q, d)
    Xs = X[None, :, :] / ls[:, None, :]                      # (q, n, d)
    n2 = (Xs * Xs).sum(-1)                                   # (q, n)
    d2 = n2[:, :, None] + n2[:, None, :] - 2.0 * Xs @ Xs.transpose(-1, -2)
    d2 = d2.clamp_min(0.0)
    r = torch.sqrt(d2.clamp_min(1e-30))
    c = SQRT5 * r
    return (1.0 + c + (5.0 / 3.0) * d2) * torch.exp(-c)


def lmc_matvec(Ks, H, st_diag, V):
    """Sigma @ vec(V): (r, n, T) -> (r, n, T); Sigma = sum_b K_b (x) h_b h_b' + I (x) St."""
    W = torch.einsum("rnt,tb->rnb", V, H)
    Z = torch.einsum("bij,rjb->rib", Ks, W)
    return torch.einsum("rnb,tb->rnt", Z, H) + V * st_diag[None, None, :]


def batched_cg_with_tridiag(Ks, H, st_diag, B, max_iters=1000, tol=1.0,
                            min_iters=20):
    """Plain CG (no preconditioner: gpytorch's _solve has none for this
    structure) on r RHS, recording the Lanczos tridiag coefficients exactly as
    linear_operator's linear_cg(..., num_tridiag=s) does. Host-side loop with
    per-iteration convergence checks — the eager execution model gpytorch has.

    gpytorch semantics: the rhs is norm-normalized so the residual check is
    relative, termination tests the MEAN residual < tol, and with tridiags
    requested CG cannot stop before max_lanczos_quadrature_iterations (20)
    — so training CG at tol 1.0 runs exactly 20 iterations."""
    r = B.shape[0]
    X = torch.zeros_like(B)
    R = B.clone()
    P = R.clone()
    rz = (R * R).sum(dim=(1, 2))
    bnorm = rz.clamp_min(1e-30).sqrt()
    alphas, betas = [], []
    n_iter = 0
    for j in range(max_iters):
        Ap = lmc_matvec(Ks, H, st_diag, P)
        pAp = (P * Ap).sum(dim=(1, 2)).clamp_min(1e-30)
        alpha = rz / pAp
        X += alpha[:, None, None] * P
        R -= alpha[:, None, None] * Ap
        rz_new = (R * R).sum(dim=(1, 2))
        beta = rz_new / rz.clamp_min(1e-30)
        alphas.append(alpha)
        betas.append(beta)
        rz = rz_new
        n_iter = j + 1
        if j + 1 >= min_iters and (rz.sqrt() / bnorm).mean() < tol:
            break
        P = R + beta[:, None, None] * P
    return X, torch.stack(alphas), torch.stack(betas), n_iter


def logdet_from_cg(alphas, betas, bnorm2, nT):
    """e1' log(T_k) e1 quadrature per probe from CG coefficients
    (linear_operator lanczos_tridiag_to_diag + to_dense path)."""
    K, s = alphas.shape
    diag = 1.0 / alphas.clamp_min(1e-30)
    diag[1:] += (betas[:-1] / alphas[:-1].clamp_min(1e-30))
    off = betas[:-1].clamp_min(0).sqrt() / alphas[:-1].clamp_min(1e-30)
    T = torch.zeros(s, K, K, dtype=alphas.dtype)
    idx = torch.arange(K)
    T[:, idx, idx] = diag.T
    if K > 1:
        T[:, idx[:-1], idx[1:]] = off.T
        T[:, idx[1:], idx[:-1]] = off.T
    evals, evecs = torch.linalg.eigh(T)
    evals = evals.clamp_min(1e-10)
    tau2 = evecs[:, 0, :] ** 2
    quad = (tau2 * evals.log()).sum(-1)                      # (s,)
    return (bnorm2 * quad).mean()


def lmc_step(params, X, Y, opt, num_probes=10, max_cg=1000, cg_tol=1.0,
             backward_ctx=None):
    """One full training iteration: MLL forward + backward + AdamW update.
    Gradients through the solve use the implicit identities on the saved
    solves (linear_operator InvQuadLogdet.backward), chained through the
    eager autograd of the kernel build — the same split gpytorch has.

    ``backward_ctx``: optional context manager (e.g. a torch.profiler
    profile) wrapped around the backward phase only."""
    import contextlib
    log_ls, H, raw_st = params
    n, T = Y.shape
    opt.zero_grad()
    phase_t = {}

    t0 = time.time()
    Ks = matern25_stack(X, log_ls)                           # autograd-tracked
    st_diag = torch.nn.functional.softplus(raw_st)
    phase_t["kernel_build"] = time.time() - t0

    t0 = time.time()
    with torch.no_grad():
        probes = torch.randint(0, 2, (num_probes, n, T), dtype=Ks.dtype) * 2.0 - 1.0
        B = torch.cat([Y[None], probes], dim=0)
        Xsol, alphas, betas, n_cg = batched_cg_with_tridiag(
            Ks.detach(), H.detach(), st_diag.detach(), B, max_cg, cg_tol)
        alpha_y, W = Xsol[0], Xsol[1:]
        bnorm2 = (probes * probes).sum(dim=(1, 2))
        logdet = logdet_from_cg(alphas[:, 1:], betas[:, 1:], bnorm2, n * T)
    phase_t["cg"] = time.time() - t0
    t0 = time.time()

    # surrogate whose autograd gradients equal the implicit-function gradients:
    # quad:  d(y' S^-1 y)/dtheta = -alpha' (dS/dtheta) alpha
    # logdet: d(logdet S)/dtheta ~ (1/2s) sum_i (w_i'(dS)z_i + z_i'(dS)w_i)
    with (backward_ctx if backward_ctx is not None
          else contextlib.nullcontext()):
        s = W.shape[0]
        Sa = lmc_matvec(Ks, H, st_diag, alpha_y[None])[0]
        quad_sur = -(alpha_y * Sa).sum()                     # grad: -a (dS) a
        SW = lmc_matvec(Ks, H, st_diag, probes)
        logdet_sur = (W * SW).sum() / s                      # grad: (1/s) w(dS)z
        with torch.no_grad():
            quad_val = (Y * alpha_y).sum()
        loss = 0.5 * (quad_sur + logdet_sur)                 # d/dtheta of -ll
        loss.backward()
        opt.step()
    phase_t["backward"] = time.time() - t0
    with torch.no_grad():
        nll = 0.5 * (quad_val + logdet + n * T * math.log(2 * math.pi))
    return float(nll), n_cg, phase_t


def cost_ledger(n, T, q, d, n_cg, s):
    """(flops, bytes, n_ops) per phase of one eager training step.

    Counts the DOMINANT terms of the op sequence eager torch actually runs
    (gpytorch's is a superset — more dispatch, same numeric ops):

      kernel_build: scaled inputs + Xs@Xs' (2qn²d flops) + ~8 elementwise
        passes over the (q,n,n) stack (d2 assembly, clamp, sqrt, poly, exp,
        mul), each streaming read+write of 4 B/elt; autograd saves r and the
        exp term (extra writes folded into the pass count).
      cg: n_cg iterations; each matvec reads the 4qn² B stack once
        (2qn²r flops for the batched GEMM, r = 1+s RHS) plus ~8 small vector
        ops on the (r,n,T) state; per-iteration host sync for the
        convergence test.
      backward: two matvec-equivalents (surrogate quad/logdet terms), the
        dK outer product (2qn²r flops, one stack write), and the elementwise
        chain back through the kernel build (~8 more stack passes).
    """
    r = 1 + s
    stack_b = 4.0 * q * n * n
    el = dict(
        kernel_build=(2.0 * q * n * n * d + 8 * q * n * n,
                      8 * 2 * stack_b, 14),
        cg=(n_cg * (2.0 * q * n * n * r + 12.0 * n * T * r),
            n_cg * (stack_b + 8 * 3 * 4.0 * r * n * T), 12 * n_cg),
        backward=(3 * 2.0 * q * n * n * r + 2.0 * q * n * n * d + 8 * q * n * n,
                  3 * stack_b + stack_b + 8 * 2 * stack_b, 30),
    )
    return el


def price_ledger(ledger, tflops, gbs, launch_s=0.0):
    """Per-phase time: max(flop time, byte time) + launches."""
    out = {}
    for phase, (fl, by, nops) in ledger.items():
        out[phase] = max(fl / (tflops * 1e12), by / (gbs * 1e9)) \
            + nops * launch_s
    out["total"] = sum(out.values())
    return out


A100_FP32_TFLOPS = 19.5      # fp32 peak; TF32 disabled by the reference
A100_HBM_GBS = 2039.0        # A100 80GB SXM
A100_DERATE = 0.8            # attainable fraction of both peaks (generous)
A100_LAUNCH_S = 5e-6         # eager CUDA launch+dispatch floor per op


def measure_gemm_tflops(size=4096, reps=3):
    A = torch.randn(size, size)
    Bm = torch.randn(size, size)
    A @ Bm
    t0 = time.time()
    for _ in range(reps):
        A @ Bm
    dt = (time.time() - t0) / reps
    return 2 * size**3 / dt / 1e12


def measure_stream_gbs(mb=256, reps=5):
    """In-place add: 2 reads + 1 write per element, no allocator traffic."""
    x = torch.randn(mb * 1024 * 1024 // 4)
    y = x.clone()
    y.add_(x)
    t0 = time.time()
    for _ in range(reps):
        y.add_(x)
    dt = (time.time() - t0) / reps
    return 3 * x.numel() * 4 / dt / 1e9


def run(n=10000, T=7, q=4, d=4, steps=3, warmup=1, seed=0):
    torch.manual_seed(seed)
    X = torch.randn(n, d)
    Y = torch.randn(n, T)
    log_ls = torch.zeros(q, d, requires_grad=True)
    H = torch.randn(T, q, requires_grad=True)
    raw_st = torch.zeros(T, requires_grad=True)
    params = (log_ls, H, raw_st)
    opt = torch.optim.AdamW(params, lr=1e-2)

    cg_counts, phases = [], []
    for _ in range(warmup):
        _, n_cg, _ = lmc_step(params, X, Y, opt)
        cg_counts.append(n_cg)
    t0 = time.time()
    for _ in range(steps):
        _, n_cg, ph = lmc_step(params, X, Y, opt)
        cg_counts.append(n_cg)
        phases.append(ph)
    dt = (time.time() - t0) / steps
    phase_med = {k: float(np.median([p[k] for p in phases]))
                 for k in phases[0]}
    return 1.0 / dt, cg_counts, phase_med


def profile_backward(n=4000, T=7, q=4, d=4, seed=0, num_probes=10,
                     top_k=12):
    """torch.profiler per-op measurement of the backward phase (VERDICT r2
    item 3: 'tighten the backward ledger with torch.profiler op times').

    The round-2 ledger modeled the backward as 3 matvec-equivalents + one
    dK outer + ~8 elementwise stack passes and mispredicted the measured
    host backward by 53.8×. This measures what eager autograd ACTUALLY
    runs: per-op self times and an input-shape-derived bytes-touched
    estimate. Returns (per_op_table, est_bytes, est_ops, measured_seconds).

    Bytes estimate per op: 4 B × (Σ input elements + largest input's
    element count as an output proxy — torch.profiler records input shapes
    only). Crude per-op, but summed over hundreds of stack-sized ops it
    pins the pass COUNT the analytic guess got wrong.
    """
    from torch.profiler import profile, ProfilerActivity
    torch.manual_seed(seed)
    X = torch.randn(n, d)
    Y = torch.randn(n, T)
    log_ls = torch.zeros(q, d, requires_grad=True)
    H = torch.randn(T, q, requires_grad=True)
    raw_st = torch.zeros(T, requires_grad=True)
    params = (log_ls, H, raw_st)
    opt = torch.optim.AdamW(params, lr=1e-2)
    lmc_step(params, X, Y, opt, num_probes=num_probes)       # warmup
    prof = profile(activities=[ProfilerActivity.CPU], record_shapes=True)
    t0 = time.time()
    _, _, ph = lmc_step(params, X, Y, opt, num_probes=num_probes,
                        backward_ctx=prof)
    measured_s = ph["backward"]
    est_bytes = 0.0
    est_ops = 0
    rows = []
    for evt in prof.key_averages(group_by_input_shape=False):
        self_s = evt.self_cpu_time_total / 1e6
        if self_s <= 0:
            continue
        est_ops += evt.count
        rows.append((evt.key, round(self_s, 3), evt.count))
    # bytes from the raw event stream (shapes live there)
    for evt in prof.events():
        shapes = getattr(evt, "input_shapes", None) or []
        elems = [int(np.prod(s)) for s in shapes if s]
        if elems:
            est_bytes += 4.0 * (sum(elems) + max(elems))
    rows.sort(key=lambda r: -r[1])
    table = [{"op": k, "self_s": v, "count": c} for k, v, c in rows[:top_k]]
    return table, est_bytes, est_ops, measured_s


def tighten_backward(path="results/baseline_torch.json", n_profile=4000):
    """Recalibrate the stored baseline's backward ledger from a profiled
    backward at n=n_profile, rescaled to the headline n (stack-sized traffic
    scales as n²; the profile's measured wall time validates the estimate at
    n_profile before scaling). Rewrites the derived A100 quantities:

    * ``a100_gpytorch_iters_per_sec_est`` now prices the MEASURED eager op
      stream (what gpytorch-on-A100 actually launches);
    * ``a100_algorithm_sol_iters_per_sec`` keeps the ANALYTIC minimal
      ledger — the algorithm's roofline is not a property of eager
      autograd's materialization strategy.
    """
    with open(path) as f:
        base = json.load(f)
    cfg = base["config"]
    n, T, q, d, s = cfg["n"], cfg["T"], cfg["q"], cfg["d"], cfg["num_probes"]
    table, bytes_p, ops_p, meas_s = profile_backward(n=n_profile, T=T, q=q,
                                                     d=d, num_probes=s)
    # validate the bytes estimate against the profiled run itself
    host_bw = float(base["host_stream_gbs"])
    host_gemm = float(base["host_gemm_tflops"])
    pred_profile_s = bytes_p / (host_bw * 1e9)
    # scale stack-sized traffic n_profile -> n (dominant terms are (q,n,n))
    scale = (n / float(n_profile)) ** 2
    bytes_bwd = bytes_p * scale
    n_cg = int(np.median(base["cg_iters_per_step"]))
    ledger = cost_ledger(n, T, q, d, n_cg, s)
    fl_bwd = ledger["backward"][0]          # flops stay analytic (bw-bound)
    ledger_meas = dict(ledger)
    ledger_meas["backward"] = (fl_bwd, bytes_bwd, int(ops_p))

    host_pred = price_ledger(ledger_meas, host_gemm, host_bw)
    phase_med = base["host_phase_seconds"]
    base["host_model_ratio"] = {
        k: round(phase_med[k] / max(host_pred[k], 1e-9), 2)
        for k in phase_med}
    base["host_measured_vs_predicted_total"] = round(
        sum(phase_med.values()) / max(host_pred["total"], 1e-9), 2)
    a100_eager = price_ledger(ledger_meas, A100_FP32_TFLOPS * A100_DERATE,
                              A100_HBM_GBS * A100_DERATE, A100_LAUNCH_S)
    a100_sol = price_ledger(ledger, A100_FP32_TFLOPS * A100_DERATE,
                            A100_HBM_GBS * A100_DERATE)
    speedup_pred = host_pred["total"] / a100_eager["total"]
    its = float(base["host_cpu_iters_per_sec"])
    base["ledger_flops_bytes_ops"]["backward"] = [fl_bwd, bytes_bwd,
                                                  int(ops_p)]
    base["a100_phase_seconds"] = {k: round(v, 5)
                                  for k, v in a100_eager.items()}
    base["a100_sol_phase_seconds"] = {k: round(v, 5)
                                      for k, v in a100_sol.items()}
    base["host_to_a100_speedup_pred"] = round(speedup_pred, 1)
    base["a100_gpytorch_iters_per_sec_est"] = round(its * speedup_pred, 3)
    base["a100_algorithm_sol_iters_per_sec"] = round(
        1.0 / a100_sol["total"], 3)
    base["backward_profiler_seconds"] = {
        "profiled_at_n": n_profile,
        "measured_backward_s": round(meas_s, 2),
        "bytes_estimate_at_profile_n": bytes_p,
        "bytes_predicted_backward_s_at_profile_n": round(pred_profile_s, 2),
        "scaled_bytes_at_headline_n": bytes_bwd,
        "op_count": int(ops_p),
        "top_ops_self_s": table,
        "note": ("backward ledger bytes/ops replaced by torch.profiler "
                 "measurement of the actual eager autograd op stream "
                 "(input-shape bytes estimate), scaled n_profile->n by n^2; "
                 "flops kept analytic (phase is bandwidth-bound). "
                 "a100_gpytorch_est prices THIS stream; a100_algorithm_sol "
                 "keeps the minimal analytic ledger."),
    }
    base["methodology"] += (
        " [round 3] backward ledger tightened from torch.profiler per-op "
        "times; see backward_profiler_seconds.")
    with open(path, "w") as f:
        json.dump(base, f, indent=2)
    print(json.dumps({k: base[k] for k in (
        "host_model_ratio", "host_to_a100_speedup_pred",
        "a100_gpytorch_iters_per_sec_est",
        "a100_algorithm_sol_iters_per_sec")}, indent=2))
    print(json.dumps(base["backward_profiler_seconds"], indent=2))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=10000)
    ap.add_argument("--steps", type=int, default=3)
    ap.add_argument("--out", default="results/baseline_torch.json")
    ap.add_argument("--quick", action="store_true",
                    help="n=2000 smoke run, no file write")
    ap.add_argument("--tighten-backward", action="store_true",
                    help="recalibrate the stored backward ledger from a "
                         "torch.profiler run (no full remeasurement)")
    ap.add_argument("--n-profile", type=int, default=4000)
    args = ap.parse_args()
    if args.tighten_backward:
        tighten_backward(args.out, n_profile=args.n_profile)
        return
    if args.quick:
        args.n = 2000

    gemm = measure_gemm_tflops()
    bw = measure_stream_gbs()
    its, cg_counts, phase_med = run(n=args.n, steps=args.steps)

    n, T, q, d, s = args.n, 7, 4, 4, 10
    n_cg = int(np.median(cg_counts))
    ledger = cost_ledger(n, T, q, d, n_cg, s)
    # validate the ledger on this host (launch cost folded into the rates)
    host_pred = price_ledger(ledger, gemm, bw)
    host_meas_total = sum(phase_med.values())
    host_ratio = {k: round(phase_med[k] / max(host_pred[k], 1e-9), 2)
                  for k in phase_med}
    # price at generous A100 rates
    a100 = price_ledger(ledger, A100_FP32_TFLOPS * A100_DERATE,
                        A100_HBM_GBS * A100_DERATE, A100_LAUNCH_S)
    # speed-of-light bound: the algorithm's roofline on the A100 — an
    # unreachable ceiling for any eager framework
    a100_sol = 1.0 / a100["total"]
    # headline estimate (ratio method): scale the MEASURED host step time by
    # the ledger-predicted host->A100 speedup. Absolute ledger miscalibration
    # cancels in the ratio; what carries over is the measured eager-execution
    # character of the workload, which an A100 does not remove.
    speedup_pred = host_pred["total"] / a100["total"]
    a100_est = its * speedup_pred

    out = {
        "config": {"n": n, "T": T, "q": q, "d": d, "num_probes": s,
                   "cg_tol": 1.0, "max_cg": 1000, "min_cg": 20},
        "host_cpu_iters_per_sec": round(its, 4),
        "host_phase_seconds": {k: round(v, 3) for k, v in phase_med.items()},
        "cg_iters_per_step": cg_counts,
        "host_gemm_tflops": round(gemm, 4),
        "host_stream_gbs": round(bw, 2),
        "ledger_flops_bytes_ops": {k: [v[0], v[1], v[2]]
                                   for k, v in ledger.items()},
        "host_model_ratio": host_ratio,
        "host_measured_vs_predicted_total": round(
            host_meas_total / max(host_pred["total"], 1e-9), 2),
        "a100_assumptions": {"fp32_tflops": A100_FP32_TFLOPS,
                             "hbm_gbs": A100_HBM_GBS,
                             "derate": A100_DERATE,
                             "launch_s_per_op": A100_LAUNCH_S},
        "a100_phase_seconds": {k: round(v, 5) for k, v in a100.items()},
        "host_to_a100_speedup_pred": round(speedup_pred, 1),
        "a100_gpytorch_iters_per_sec_est": round(a100_est, 3),
        "a100_algorithm_sol_iters_per_sec": round(a100_sol, 3),
        "methodology": (
            "eager-torch reimplementation of gpytorch 1.11's exact-LMC "
            "inv_quad_logdet estimator (CG tol 1.0, minimum 20 iterations "
            "for the Lanczos tridiags, 10 probes, logdet from the CG "
            "coefficients, implicit-gradient backward), measured per-phase "
            "on this host. Headline estimate = measured host iters/sec x "
            "ledger-predicted host->A100 speedup (per-phase flop/byte "
            "roofline at fp32 peak x0.8, HBM x0.8, 5us/op launch); absolute "
            "ledger miscalibration cancels in the ratio, and the host "
            "validation ratios are reported. a100_algorithm_sol is the pure "
            "roofline of the same estimator — the unreachable ceiling for "
            "any eager framework, reported as the upper bound"),
        "torch_threads": torch.get_num_threads(),
    }
    print(json.dumps(out, indent=2))
    if not args.quick:
        os.makedirs(os.path.dirname(args.out) or ".", exist_ok=True)
        with open(args.out, "w") as f:
            json.dump(out, f, indent=2)


if __name__ == "__main__":
    main()
