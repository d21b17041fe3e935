"""Blocked Cholesky with bf16 trailing updates — TPU-first factorization.

Stock XLA Cholesky on a v5e reaches ~12 TFLOP/s at n=8192 (~25% of fp32
peak, BENCH_r01): its panel factorization and fp32 trailing updates leave the
MXU's native-bf16 rate (4× the fp32 rate) on the table. This right-looking
blocked variant keeps everything accuracy-critical in fp32 — the diagonal
block factorizations, the panel solves, and every accumulation — and runs
only the O(n³/3) trailing SYRK updates with bf16 *inputs* on the MXU
(fp32 accumulation via preferred_element_type):

    for each block column k:
        L_kk   = chol(A_kk)                 fp32   (XLA, b×b)
        L_21   = A_21 · L_kk⁻ᵀ              fp32   (GEMM against the small
                                                    triangular inverse — TPU
                                                    triangular solves
                                                    substitute sequentially,
                                                    so solving n-sized RHS
                                                    directly is the slow way)
        A_22  -= L_21 · L_21ᵀ               bf16-in / fp32-accum  (MXU)

The bf16 rounding of L_21 perturbs the trailing update by ~2⁻⁸ relative —
equivalent to factoring A + E with ‖E‖/‖A‖ ≈ 4e-3 of the off-diagonal energy.
That is the same operator-noise class as the bf16 kernel-stack matvec the
training path already runs (ops/iterative.py); use for training-tolerance
factorizations (ICM MLL, preconditioners), NOT for tight posterior algebra.

Robustness on GP-shaped spectra (low-rank-dominant + small ridge, e.g.
K = HHᵀ + σ²I with σ² ≪ ‖K‖): after the leading blocks absorb the low-rank
mass, the Schur complement's scale drops to σ² while the accumulated bf16
update noise stays at ~4e-3·‖L_21‖² — the trailing diagonal blocks go
indefinite and a bare factorization NaNs (measured at n=8192, rank 256,
σ²=1e-2). Two countermeasures, both cheap:
  * the diagonal of every trailing update is recomputed exactly in fp32
    (row sums of L_21², O(n·b) VPU work) — only off-diagonal entries carry
    bf16 noise;
  * diagonal blocks factor through safe_cholesky's escalating-jitter ladder,
    so residual indefiniteness costs jitter (a K + δI model perturbation of
    the same order as the bf16 operator noise), never a NaN.

Batched over leading dimensions like ``jnp.linalg.cholesky``. Fully
jit-compatible: the block loop unrolls at trace time (static shapes per
block). Differentiable through standard autodiff (every op has a JVP); the
gradient carries the same bf16-level noise as the value.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from .cholesky import safe_cholesky

_HIGHEST = jax.lax.Precision.HIGHEST


def cholesky_bf16_blocked(A, block: int = 1024):
    """Lower-Cholesky factor of SPD ``A`` (..., n, n) with bf16 trailing
    updates (exact fp32 update diagonals, jitter-laddered panel chols — see
    module docstring). Falls back to ``jnp.linalg.cholesky`` when n <= block."""
    n = A.shape[-1]
    if n <= block:
        return jnp.linalg.cholesky(A)
    eye_b = jnp.eye(block, dtype=A.dtype)

    # accumulate the output in one buffer; A shrinks logically via updates
    L = jnp.zeros_like(A)
    nb = -(-n // block)
    for k in range(nb):
        s = k * block
        e = min(s + block, n)
        b = e - s
        Akk = A[..., s:e, s:e]
        Lkk = safe_cholesky(Akk)
        L = L.at[..., s:e, s:e].set(Lkk)
        if e >= n:
            break
        # small triangular inverse once, then the panel is one big GEMM
        eye = eye_b if b == block else jnp.eye(b, dtype=A.dtype)
        Lkk_inv = jax.scipy.linalg.solve_triangular(
            Lkk, jnp.broadcast_to(eye, Lkk.shape), lower=True)
        A21 = A[..., e:, s:e]
        L21 = jnp.matmul(A21, jnp.swapaxes(Lkk_inv, -1, -2),
                         precision=_HIGHEST)
        L = L.at[..., e:, s:e].set(L21)
        # trailing SYRK: bf16 inputs, fp32 accumulation on the MXU
        Lb = L21.astype(jnp.bfloat16)
        upd = jnp.matmul(Lb, jnp.swapaxes(Lb, -1, -2),
                         preferred_element_type=jnp.float32).astype(A.dtype)
        # exact fp32 diagonal: the sqrt-critical entries carry no bf16 noise
        # (mask select, not scatter — scatter on an (n-e)² operand measured
        # ~20 ms extra at n=8192 on a v5e)
        diag_exact = jnp.sum(L21 * L21, axis=-1)
        m = n - e
        eye_mask = jnp.eye(m, dtype=bool)
        upd = jnp.where(eye_mask, diag_exact[..., :, None], upd)
        A = A.at[..., e:, e:].add(-upd)
    return L


def cholesky_blocked_f32(A, block: int = 1024):
    """Same blocking with fp32 trailing updates — isolates the blocking
    effect from the precision effect when benchmarking."""
    n = A.shape[-1]
    if n <= block:
        return jnp.linalg.cholesky(A)
    eye_b = jnp.eye(block, dtype=A.dtype)
    L = jnp.zeros_like(A)
    nb = -(-n // block)
    for k in range(nb):
        s = k * block
        e = min(s + block, n)
        b = e - s
        Lkk = jnp.linalg.cholesky(A[..., s:e, s:e])
        L = L.at[..., s:e, s:e].set(Lkk)
        if e >= n:
            break
        eye = eye_b if b == block else jnp.eye(b, dtype=A.dtype)
        Lkk_inv = jax.scipy.linalg.solve_triangular(
            Lkk, jnp.broadcast_to(eye, Lkk.shape), lower=True)
        L21 = jnp.matmul(A[..., e:, s:e], jnp.swapaxes(Lkk_inv, -1, -2),
                         precision=_HIGHEST)
        L = L.at[..., e:, s:e].set(L21)
        upd = jnp.matmul(L21, jnp.swapaxes(L21, -1, -2), precision=_HIGHEST)
        A = A.at[..., e:, e:].add(-upd)
    return L
