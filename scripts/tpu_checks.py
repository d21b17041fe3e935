#!/usr/bin/env python
"""On-hardware parity checks (the TPU complement of the CPU pytest suite).

The pytest suite runs on a virtual CPU mesh (tests/conftest.py), so it cannot
see TPU-only numerics — e.g. the Pallas MXU fp32-passes bug this script's
check 1 caught (bf16 dot passes amplified to ~1e-1 kernel error by the
n1+n2−2·cross cancellation). Run manually or from automation whenever the
compute path changes:

    python scripts/tpu_checks.py          # needs the tunneled chip

Exit code 0 = all checks pass.
"""

import sys
import time

import numpy as np


def main():
    sys.path.insert(0, "/root/repo")
    from projected_lmc_tpu.utils.tpu import ensure_tpu
    ensure_tpu()
    import jax
    import jax.numpy as jnp
    assert jax.default_backend() == "tpu", jax.default_backend()
    failures = []

    # 1. Pallas fused kernel vs XLA on hardware (forward + gradient)
    from projected_lmc_tpu.ops.pallas_kernels import (fused_kernel_matrix,
                                                      xla_kernel_matrix)
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((512, 4)).astype(np.float32))
    ls = jnp.asarray(rng.uniform(0.5, 2.0, (4, 1, 4)).astype(np.float32))
    for kind in ("rbf", "matern25", "matern15", "matern05"):
        K1 = fused_kernel_matrix(x, x, ls, kind, False)
        K2 = xla_kernel_matrix(x, x, ls, kind)
        err = float(jnp.max(jnp.abs(K1 - K2)))
        # matern05 = exp(-sqrt(d2)) has slope -1 at r=0, so the two paths'
        # independent fp32 roundings of near-zero d2 (±1e-6 at coincident
        # points) legitimately differ by ~sqrt(1e-6); the smoother kernels
        # have zero slope there and agree to ~1e-5.
        tol = 5e-3 if kind == "matern05" else 5e-5
        ok = err < tol
        print(f"1. pallas {kind:9s} parity: {err:.2e} {'OK' if ok else 'FAIL'}")
        if not ok:
            failures.append(f"pallas {kind} parity {err}")
    g1 = jax.grad(lambda l: jnp.sum(
        fused_kernel_matrix(x, x, l, "matern25", False) ** 2))(ls)
    g2 = jax.grad(lambda l: jnp.sum(xla_kernel_matrix(x, x, l, "matern25") ** 2))(ls)
    gerr = float(jnp.max(jnp.abs(g1 - g2)) / jnp.max(jnp.abs(g2)))
    print(f"1. pallas matern25 grad parity: {gerr:.2e}",
          "OK" if gerr < 1e-3 else "FAIL")
    if gerr >= 1e-3:
        failures.append(f"pallas grad parity {gerr}")

    # 2. iterative (CG+SLQ) vs dense Woodbury LMC MLL on hardware, fp32
    from projected_lmc_tpu.ops import woodbury as wb
    from projected_lmc_tpu.ops import iterative as it
    n, t, q = 256, 5, 2
    X = rng.uniform(-1, 1, (n, 2))
    Ks = np.stack([np.exp(-((X[:, None, :] - X[None, :, :]) ** 2).sum(-1)
                          / (2 * (0.5 + 0.3 * b) ** 2)) for b in range(q)])
    Ks = jnp.asarray(Ks, jnp.float32)
    H = jnp.asarray(rng.standard_normal((t, q)), jnp.float32)
    A = rng.standard_normal((t, t)) * 0.1
    St = jnp.asarray(A @ A.T + 0.5 * np.eye(t), jnp.float32)
    Y = jnp.asarray(rng.standard_normal((n, t)), jnp.float32)
    vd = float(wb.lmc_log_prob(Ks, H, St, Y))
    probes = it.draw_probes(jax.random.PRNGKey(0), n, t, 32, jnp.float32)
    vi = float(it.lmc_iterative_log_prob(Ks, H, St, Y, probes, 400, 1e-6, 30))
    rel = abs(vi - vd) / abs(vd)
    print(f"2. iterative vs dense LMC mll: {vi:.4f} vs {vd:.4f} rel {rel:.2e}",
          "OK" if rel < 3e-2 else "FAIL")
    if rel >= 3e-2:
        failures.append(f"iterative mll parity {rel}")

    # 3. safe_cholesky jitter-ladder rescue of a singular matrix on-device
    from projected_lmc_tpu.ops.cholesky import safe_cholesky
    M = jnp.ones((64, 64), jnp.float32)          # rank-1, needs the ladder
    L = jax.jit(safe_cholesky)(M)
    ok = bool(jnp.all(jnp.isfinite(L)))
    print("3. jitter-ladder rescue:", "OK" if ok else "FAIL")
    if not ok:
        failures.append("jitter ladder")

    # 4. one sharded-code-path step on the single real chip (mesh of 1x1)
    from projected_lmc_tpu.parallel.mesh import make_mesh
    from projected_lmc_tpu.parallel.sharded import dryrun_step
    from projected_lmc_tpu.mlls import projected_lmc_mll
    from projected_lmc_tpu.models.projected import ProjectedGPModel
    Xs = np.linspace(-1, 1, 64)[:, None].astype(np.float32)
    Ys = np.stack([np.sin(3 * Xs[:, 0]), np.cos(5 * Xs[:, 0])], 1) @ \
        rng.standard_normal((2, 6)) + 0.05 * rng.standard_normal((64, 6))
    mdl = ProjectedGPModel(Xs, Ys.astype(np.float32), 6, 2, init_lmc_coeffs=True)
    mesh = make_mesh(1, latent=1, data=1)
    loss = dryrun_step(mdl, mesh, projected_lmc_mll)
    print(f"4. sharded step on-chip: loss {loss:.4f}",
          "OK" if np.isfinite(loss) else "FAIL")
    if not np.isfinite(loss):
        failures.append("sharded step")

    # 5. jax.profiler trace of one on-chip step (utils.profiling wiring):
    # artifacts land in /tmp/jax-trace for TensorBoard inspection
    from projected_lmc_tpu.utils.profiling import profile_trace, Timer
    import glob
    import os
    logdir = "/tmp/jax-trace"
    with Timer() as tm, profile_trace(logdir):
        float(jax.jit(projected_lmc_mll)(mdl))
    traced = glob.glob(os.path.join(logdir, "**", "*.pb"), recursive=True) \
        + glob.glob(os.path.join(logdir, "**", "*.xplane.pb"), recursive=True)
    ok = len(traced) > 0
    print(f"5. profiler trace ({tm.elapsed * 1e3:.1f} ms step, "
          f"{len(traced)} artifacts):", "OK" if ok else "FAIL")
    if not ok:
        failures.append("profiler trace produced no artifacts")

    if failures:
        print("FAILURES:", failures)
        return 1
    print("ALL TPU CHECKS PASSED")
    return 0


if __name__ == "__main__":
    sys.exit(main())
