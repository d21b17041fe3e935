"""Fused stationary-kernel exact-LMC MLL: the whole training-step hot path
— kernel-stack build → Nyström-preconditioned CG → Lanczos quadrature —
as ONE custom-VJP op whose backward never materializes the (q, n, n)
kernel cotangent.

Motivation (SURVEY §7 "fusing kernel construction into the factorization"):
the composed path (kernels.stationary_kernel_matrix → iterative.
lmc_pcg_log_prob) is mathematically identical but its backward writes the
dense cotangent dK (q, n, n) to HBM, then the kernel VJP reads it back and
materializes the elementwise product W = dK ⊙ dprofile(d²) — at the
benchmark scale (n=10⁴, q=4) roughly 2 GB written + 4 GB read of pure
intermediate traffic per step. Here the backward instead exploits that
dK is LOW-RANK by construction:

    dK_b = g·[½ (αh_b)(αh_b)ᵀ − (1/4s) Σ_i ((W_i h_b)(Z̃_i h_b)ᵀ + sym)]
         = A_b B_bᵀ,     rank ≤ 1 + 2s  (s = Hutchinson probes, 8 → 17)

so every tile of dK is a (tile × r)·(r × tile) MXU product recomputed in
VMEM, and the only HBM traffic is the factor matrices (q·n·r floats).
The lengthscale/outputscale gradients reduce through one Pallas pass
(pallas_kernels.lowrank_stationary_reduce); dH/dΣt reuse the single
batched stack stream the composed path already performs; the outputscale
gradient falls out of that same stream for free.

Scope: symmetric training evaluations (x1 ≡ x2) of a bare or Scale-wrapped
stationary kernel (RBF / Matérn) with no active_dims — exactly the exact-LMC
training MLL (reference hot loop, projected_lmc.py:586-589 →
gpytorch inv_quad_logdet). The input-location cotangent is NOT computed
(training data is constant); callers pass x through stop_gradient and the
op returns zeros for it.
"""

from __future__ import annotations

import os
from functools import partial

import jax
import jax.numpy as jnp

from . import iterative as it
from . import pallas_kernels as pk

_HIGHEST = jax.lax.Precision.HIGHEST


def _use_pallas(x):
    # single-TPU only: pallas_call is not automatically partitionable (the
    # model layer already routes multi-device sessions to the composed path)
    return (jax.default_backend() == "tpu" and jax.device_count() == 1
            and x.dtype == jnp.float32)


# Symmetric triangular-grid kernels: verified on-chip (scripts/
# verify_sym_kernels.py — Mosaic parity fp32 2e-6 / reduce 1e-7, builder
# 1.06×, backward reduce 1.24×). The first on-chip attempt exposed a real
# Mosaic race in the old j-indexed accumulator layout (nondeterministic wx
# errors ~1e0 at n=10240 that interpret mode accepts) — fixed by resident
# full-height accumulator blocks; see pallas_kernels._lowrank_vjp_tile_sym.
SYM_BUILD = os.environ.get("PLMC_SYM_BUILD", "1") == "1"

# Backward routing (measured on a v5e at n=10240, scripts/verify_sym_kernels
# round 3): the fully-fused kr pass (rows+wx+KA in one triangular grid,
# VMEM-flat at any n) is a wash vs {sym reduce + bf16 stack matmul} at
# n=10k (12.4 vs ~11.4 ms — the stack re-read it saves ≈ its extra MXU/VPU
# epilogue), but above the sym reduce's resident-accumulator VMEM ceiling
# (~n=13k) the old path falls back to the FULL-grid reduce, where kr wins
# big.  Routing: kr whenever the sym reduce would not fit VMEM; force with
# PLMC_KR_FUSED=1/0.
def _use_kr_fused(xc, A):
    # read at trace time (not import time) so setting PLMC_KR_FUSED after
    # import still takes effect (ADVICE r3)
    env = os.environ.get("PLMC_KR_FUSED")
    if env is not None:
        return env == "1"
    return not _sym_reduce_fits_vmem(xc, A)


def _scaled_stack(xc, ls, os_, kind, out_dtype):
    """os_b · K_b(xc, xc), downcast at the producer. The training stack is
    symmetric, so with SYM_BUILD the TPU path computes only the
    lower-triangular tiles and mirrors them (pk.scaled_kernel_stack_sym) —
    half the transcendental VPU work, the build's dominant cost at large n."""
    if _use_pallas(xc):
        if SYM_BUILD:
            return pk.scaled_kernel_stack_sym(xc, ls, os_, kind,
                                              out_dtype=out_dtype)
        return pk.scaled_kernel_stack(xc, xc, ls, os_, kind, False, out_dtype)
    K = pk.xla_kernel_matrix(xc, xc, ls, kind) * os_[:, None, None]
    return K.astype(out_dtype) if out_dtype is not None else K


def _sym_reduce_fits_vmem(xc, A):
    """Static gate for the triangular-grid reduce: its Mosaic-race fix keeps
    full-height accumulator blocks resident in VMEM, so its scoped-VMEM need
    grows linearly with n and blows the 16 MB budget around n≈15k (measured:
    fits at n=10240, needs 21.5 MB at n=20480 with B=4, d=4, r=17). Estimate
    outputs + streamed factor blocks + x, with a 1.7× Mosaic buffering
    factor, against a 15 MB allowance."""
    n, d = xc.shape
    B, _, r = A.shape
    est = 4.0 * (B * n * (1 + d) + 2 * B * n * r + 2 * n * d) * 1.7
    return est < 15e6


def _lowrank_reduce(xc, ls, A, Bf, kind):
    """(rows, wx) of W = (A Bᵀ) ⊙ dprofile(d²): Pallas on TPU, dense XLA
    reference elsewhere (small problems / CPU tests). The factor
    construction in _fused_bwd makes A Bᵀ symmetric, so the TPU path runs
    the triangular-grid kernel — half the transcendental VPU work — whenever
    its resident accumulators fit VMEM (full-grid fallback above that)."""
    if _use_pallas(xc):
        if SYM_BUILD and _sym_reduce_fits_vmem(xc, A):
            return pk.lowrank_stationary_reduce_sym(xc, ls, A, Bf, kind)
        return pk.lowrank_stationary_reduce(xc, ls, A, Bf, kind)
    a = xc[None] / ls
    n1 = jnp.sum(a * a, axis=-1)
    cross = jnp.matmul(a, jnp.swapaxes(a, -1, -2), precision=_HIGHEST)
    d2 = jnp.maximum(n1[..., :, None] + n1[..., None, :] - 2.0 * cross, 0.0)
    W = jnp.einsum("bik,bjk->bij", A, Bf, precision=_HIGHEST) \
        * pk._dprofile(kind, d2)
    rows = jnp.sum(W, axis=-1)
    wx = jnp.einsum("bij,jd->bid", W, xc, precision=_HIGHEST)
    return rows, wx


def _use_kr_stream(Ks):
    """Streamed-K backward (VERDICT r3 item 4): read the HBM-resident stack
    and recover dprofile by a rational identity instead of re-evaluating the
    exp2 sequence. MEASURED A WASH on a v5e (scripts/verify_sym_kernels +
    /tmp probe, round 4): 13.12 vs 12.67 ms at n=10240 and 38.01 vs
    37.72 ms at n=20480 against the recompute kr pass — the backward is
    bound by the shared tile work (T/KA matmuls, W reductions, per-tile
    DMA), not by the transcendental pass the stream eliminates. Default OFF;
    kept (with parity tests) as the measured answer to the 'one algebraic
    lever looks untried' question. Force with PLMC_KR_STREAM=1 (trace-time;
    int8 stacks unsupported — their dequant lives in the int8 branch)."""
    env = os.environ.get("PLMC_KR_STREAM")
    if env is not None:
        return env == "1" and Ks.dtype != jnp.int8
    return False


def _lowrank_reduce_kr(xc, ls, os_, A, Bf, kind, Ks=None):
    """(rows, wx, KA) — the fully-fused backward pass (perf lever 2):
    the kernel-cotangent reductions PLUS KA_b = (os_b·K_b) @ A_b in one
    triangular-grid pass. With ``Ks`` (the os-scaled stack, alive in HBM as
    a CG residual) and PLMC_KR_STREAM on, the Pallas pass STREAMS the stack
    tiles and recovers dprofile algebraically instead of re-evaluating exp
    (lever: results/PERF_NOTES.md 'Remaining n=20k headroom'). Pallas on
    TPU (VMEM-flat at any n); dense XLA elsewhere."""
    if _use_pallas(xc) and SYM_BUILD:
        if Ks is not None and _use_kr_stream(Ks):
            return pk.lowrank_stationary_reduce_sym_krs(xc, ls, os_, A, Bf,
                                                        Ks, kind)
        return pk.lowrank_stationary_reduce_sym_kr(xc, ls, os_, A, Bf, kind)
    a = xc[None] / ls
    n1 = jnp.sum(a * a, axis=-1)
    cross = jnp.matmul(a, jnp.swapaxes(a, -1, -2), precision=_HIGHEST)
    d2 = jnp.maximum(n1[..., :, None] + n1[..., None, :] - 2.0 * cross, 0.0)
    W = jnp.einsum("bik,bjk->bij", A, Bf, precision=_HIGHEST) \
        * pk._dprofile(kind, d2)
    rows = jnp.sum(W, axis=-1)
    wx = jnp.einsum("bij,jd->bid", W, xc, precision=_HIGHEST)
    K = pk._profile(kind, d2) * os_[:, None, None]
    ka = jnp.einsum("bij,bjr->bir", K, A, precision=_HIGHEST)
    return rows, wx, ka


@partial(jax.custom_vjp, nondiff_argnums=(9, 10, 11, 12, 13, 14))
def lmc_pcg_log_prob_stationary(x, ls, os_, H, St, Ydelta, eps, xi, roots,
                                kind, max_cg_iters=32, cg_tol=1e-2,
                                matvec_bf16=False, precond_rank=256,
                                matvec_int8=False):
    """log N(vec(Y); 0, Σ_b os_b K_b(x; ls_b) ⊗ h_b h_bᵀ + I ⊗ Σt) with the
    stack built inside the op (iterative.lmc_pcg_log_prob semantics,
    stationary-kernel-specialized backward; see module docstring).

    x (n, d) — pass through stop_gradient: its cotangent is returned as
    zeros. ls (q, 1, d) lengthscales, os_ (q,) outputscales (ones for a bare
    kernel — the cotangent of a literal is discarded by the caller's jvp).
    Remaining args exactly as :func:`iterative.lmc_pcg_log_prob`.

    ``matvec_int8``: the Pallas builder writes int8 tiles straight from VMEM
    (round(profile·127); dequant scale os_b/127 — range-exact since the
    stationary profile lies in [0, 1]); the CG loop and the backward's
    batched stack stream run int8×int8→int32 on the MXU at ¼ the fp32 HBM
    bytes. Operator noise ~1% relative (vs bf16's 0.4%) — same class the
    training tolerances absorb. Takes precedence over ``matvec_bf16``.
    """
    ll, _ = _fused_fwd(x, ls, os_, H, St, Ydelta, eps, xi, roots, kind,
                       max_cg_iters, cg_tol, matvec_bf16, precond_rank,
                       matvec_int8)
    return ll


def _fused_fwd(x, ls, os_, H, St, Ydelta, eps, xi, roots, kind,
               max_cg_iters, cg_tol, matvec_bf16, precond_rank,
               matvec_int8=False):
    # translation-invariant centering, as kernels._skm_fwd (exact)
    mu = jax.lax.stop_gradient(jnp.mean(x, axis=0))
    xc = x - mu
    if matvec_int8:
        if _use_pallas(xc):
            Ks = pk.quantized_kernel_stack(xc, xc, ls, kind)
        else:
            Kb = pk.xla_kernel_matrix(xc, xc, ls, kind)
            Ks = jnp.round(Kb * 127.0).astype(jnp.int8)
        kscale = (os_.astype(jnp.float32) / 127.0)
    else:
        out_dtype = jnp.bfloat16 if matvec_bf16 else None
        Ks = _scaled_stack(xc, ls, os_, kind, out_dtype)
        kscale = None
    ll, res = it._pcg_fwd_impl(Ks, H, St, Ydelta, eps, xi, roots,
                               max_cg_iters, cg_tol, matvec_bf16,
                               precond_rank, matvec_int8, kscale)
    _, _, _, alpha, W, Ztilde, _, _, _ = res
    return ll, (xc, ls, os_, Ks, H, St, alpha, W, Ztilde,
                eps, xi, roots)


def _fused_bwd(kind, max_cg_iters, cg_tol, matvec_bf16, precond_rank,
               matvec_int8, res, g):
    xc, ls, os_, Ks, H, St, alpha, W, Zt, eps, xi, roots = res
    s = max(W.shape[0], 1)

    Ah = jnp.einsum("nt,tb->nb", alpha, H, precision=_HIGHEST)    # (n, q)
    WH = jnp.einsum("snt,tb->snb", W, H, precision=_HIGHEST)      # (s, n, q)
    ZH = jnp.einsum("snt,tb->snb", Zt, H, precision=_HIGHEST)

    # low-rank cotangent factors: dK_base = (A Bfᵀ) with os and all scalar
    # coefficients folded into Bf; dK_base is symmetric, so rows == cols and
    # wx serves both cross-term reductions of kernels._skm_bwd. Note
    # Afac[b, :, :] stacks exactly the columns of R3 = [Ah, WH, ZH] — the
    # fused TPU path below reuses it as the stack-contraction right factor.
    Afac = jnp.concatenate([Ah.T[:, :, None],
                            jnp.transpose(WH, (2, 1, 0)),
                            jnp.transpose(ZH, (2, 1, 0))], axis=-1)
    Bfac = jnp.concatenate([(0.5 * g) * Ah.T[:, :, None],
                            (-g / (4 * s)) * jnp.transpose(ZH, (2, 1, 0)),
                            (-g / (4 * s)) * jnp.transpose(WH, (2, 1, 0))],
                           axis=-1) * os_[:, None, None]
    fdt = jnp.float64 if xc.dtype == jnp.float64 else jnp.float32

    # the recompute kr pass keeps its VMEM gate (it only beats {sym reduce +
    # stack matmul} above the reduce's resident-accumulator ceiling); the
    # streamed-K pass is opt-in only — measured a wash (see _use_kr_stream)
    fused_tpu = (Ks.dtype != jnp.int8 and _use_pallas(xc) and SYM_BUILD
                 and (_use_kr_stream(Ks) or _use_kr_fused(xc, Afac)))
    if fused_tpu:
        # perf lever 2 (PERF_NOTES): ONE Pallas pass yields the lengthscale
        # reductions AND KA = (os·K) @ Afac — the backward's stack stream
        # (formerly it._stack_matmul over the 0.8 GB bf16 stack at n=10⁴)
        # is replaced by an in-tile recompute that shares the dprofile
        # transcendental. KR's layout (r, n, q) is KA's (q, n, r) transposed.
        rows, wx, KA = _lowrank_reduce_kr(
            xc, ls, os_.astype(fdt), Afac.astype(fdt), Bfac.astype(fdt),
            kind, Ks=Ks)
        KR = jnp.transpose(KA, (2, 1, 0))
    elif Ks.dtype == jnp.int8:
        # int8 stack without outputscale: quantize R3 per (probe, latent)
        # column, contract int8×int8→int32 in the native stack layout,
        # dequantize with os folded in
        R3 = jnp.concatenate([Ah[None], WH, ZH], axis=0)          # (1+2s,n,q)
        rs = jnp.clip(jnp.max(jnp.abs(R3), axis=1, keepdims=True),
                      1e-30) / 127.0                              # (r, 1, q)
        Rq = jnp.clip(jnp.round(R3 / rs), -127, 127).astype(jnp.int8)
        KRi = jnp.matmul(Ks, jnp.transpose(Rq, (2, 1, 0)),
                         preferred_element_type=jnp.int32)        # (q, i, r)
        KR = jnp.transpose(KRi, (2, 1, 0)).astype(jnp.float32) * (
            rs * (os_.astype(jnp.float32) / 127.0)[None, None, :])
    else:
        # ONE batched stack stream serves dH, dΣt-free terms AND dos
        R3 = jnp.concatenate([Ah[None], WH, ZH], axis=0)
        KR = it._stack_matmul(Ks, R3)
    KAh, KWH, KZH = KR[0], KR[1:1 + s], KR[1 + s:]

    dH_a = jnp.einsum("nt,nb->tb", alpha, KAh, precision=_HIGHEST)
    dH_s = 0.5 * (jnp.einsum("snt,snb->tb", Zt, KWH, precision=_HIGHEST)
                  + jnp.einsum("snt,snb->tb", W, KZH, precision=_HIGHEST))
    dH = g * (dH_a - dH_s / s)

    dSt_a = jnp.einsum("nt,nu->tu", alpha, alpha, precision=_HIGHEST)
    dSt_wz = jnp.einsum("snt,snu->tu", W, Zt, precision=_HIGHEST)
    dSt = g * 0.5 * (dSt_a - (dSt_wz + dSt_wz.T) / (2 * s))

    dY = -g * alpha

    # outputscale cotangent, free from KR:  dos_b = Σ_ij dK ⊙ K_base
    #   = (1/os_b)·[g/2 <Ah, K Ah> − g/(4s) Σ_i (<ZH, K WH> + <WH, K ZH>)]_b
    dos_quad = jnp.einsum("nb,nb->b", Ah, KAh, precision=_HIGHEST)
    dos_tr = (jnp.einsum("snb,snb->b", ZH, KWH, precision=_HIGHEST)
              + jnp.einsum("snb,snb->b", WH, KZH, precision=_HIGHEST))
    dos = (g * (0.5 * dos_quad - dos_tr / (4 * s))
           / os_.astype(dos_quad.dtype)).astype(os_.dtype)

    if not fused_tpu:
        rows, wx = _lowrank_reduce(xc, ls, Afac.astype(fdt),
                                   Bfac.astype(fdt), kind)
    lsq = ls[:, 0, :]                                             # (q, d)
    ls2 = lsq * lsq
    sq = jnp.einsum("bi,id->bd", rows, xc * xc, precision=_HIGHEST)
    crossd = jnp.einsum("bid,id->bd", wx, xc, precision=_HIGHEST)
    dls = -4.0 * (sq - crossd)
    if lsq.shape[-1] == 1 and dls.shape[-1] != 1:
        dls = jnp.sum(dls, axis=-1, keepdims=True)
    dls = (dls / (lsq * ls2))[:, None, :].astype(ls.dtype)

    dx = jnp.zeros_like(xc)        # training inputs are constants (docstring)
    droots = None if roots is None else jnp.zeros_like(roots)
    return (dx, dls, dos, dH, dSt, dY,
            jnp.zeros_like(eps), jnp.zeros_like(xi), droots)


lmc_pcg_log_prob_stationary.defvjp(_fused_fwd, _fused_bwd)
