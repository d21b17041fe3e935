"""On-chip verification + timing of the symmetric triangular-grid Pallas
kernels (ops/pallas_kernels.scaled_kernel_stack_sym /
lowrank_stationary_reduce_sym) against their full-grid counterparts.

These kernels pass interpret-mode parity on CPU (tests/test_fused_mll.py),
but Mosaic lowering can reject programs interpret mode accepts (round-2
BlockSpec findings), so ops/fused_mll.SYM_BUILD stays False until this
script has confirmed, on the real chip:
  1. Mosaic compiles both triangular-grid kernels (scalar-prefetch grids,
     aliased in-place mirror pass);
  2. numerical parity vs the full-grid kernels (tolerances: fp32 exact-ish,
     bf16 within one rounding class);
  3. the triangular grid actually wins wall-clock (the point is halving the
     transcendental VPU work; the mirror pass adds an HBM read+write of
     half the stack, so the win must be measured, not assumed).

Prints one JSON line; exits nonzero on any parity failure.
"""

import json
import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")
from projected_lmc_tpu.utils.tpu import ensure_tpu  # noqa: E402

ensure_tpu()

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from projected_lmc_tpu.ops import pallas_kernels as pk  # noqa: E402


def _sync(t):
    leaves = jax.tree_util.tree_leaves(t)
    float(jnp.sum(leaves[0].ravel()[:1].astype(jnp.float32)))


def timed(fn, *args, reps=6):
    """Chained dependent dispatches, one fetch (tunnel adds ~25 ms/fetch)."""

    @jax.jit
    def chain(a0):
        a = a0
        for _ in range(reps):
            out = fn(a, *args[1:])
            first = jax.tree_util.tree_leaves(out)[0]
            a = a + (0.0 * first.ravel()[0]).astype(a.dtype)
        return a

    out = chain(args[0])
    _sync(out)
    t0 = time.time()
    out = chain(out)
    _sync(out)
    return (time.time() - t0) / reps * 1e3


def main():
    n, d, q, r = 10240, 4, 4, 17
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((n, d)).astype(np.float32))
    ls = jnp.asarray(rng.uniform(0.5, 2.0, (q, 1, d)).astype(np.float32))
    os_ = jnp.asarray(rng.uniform(0.5, 2.0, q).astype(np.float32))
    U = rng.standard_normal((q, n, (r + 1) // 2)).astype(np.float32) / n
    V = rng.standard_normal((q, n, (r + 1) // 2)).astype(np.float32) / n
    A = jnp.asarray(np.concatenate([U, V], -1))
    Bf = jnp.asarray(np.concatenate([V, U], -1))   # A Bfᵀ symmetric

    out = {"n": n, "q": q, "chip": jax.devices()[0].device_kind}
    ok = True

    # --- builder parity (fp32 and bf16 out) ---
    for dt, name, tol in ((None, "fp32", 2e-6), (jnp.bfloat16, "bf16", 1e-2)):
        ref = pk.scaled_kernel_stack(x, x, ls, os_, "matern25", False, dt)
        got = pk.scaled_kernel_stack_sym(x, ls, os_, "matern25", out_dtype=dt)
        err = float(jnp.max(jnp.abs(got.astype(jnp.float32)
                                    - ref.astype(jnp.float32))))
        out[f"build_{name}_max_abs_err"] = err
        # bf16: full-grid uses fast exp on BOTH tiles of a pair; sym computes
        # one and mirrors — identical values, so parity should be exact-ish.
        ok &= err <= tol

    # --- builder timing ---
    out["build_full_ms"] = round(timed(
        lambda a: pk.scaled_kernel_stack(a, a, ls, os_, "matern25", False,
                                         jnp.bfloat16), x), 2)
    out["build_sym_ms"] = round(timed(
        lambda a: pk.scaled_kernel_stack_sym(a, ls, os_, "matern25",
                                             out_dtype=jnp.bfloat16), x), 2)
    out["build_speedup"] = round(out["build_full_ms"] / out["build_sym_ms"], 3)

    # --- reduce parity ---
    rows_f, wx_f = pk.lowrank_stationary_reduce(x, ls, A, Bf, "matern25")
    rows_s, wx_s = pk.lowrank_stationary_reduce_sym(x, ls, A, Bf, "matern25")
    scale = float(jnp.max(jnp.abs(rows_f))) + 1e-30
    err_rows = float(jnp.max(jnp.abs(rows_s - rows_f))) / scale
    scale_wx = float(jnp.max(jnp.abs(wx_f))) + 1e-30
    err_wx = float(jnp.max(jnp.abs(wx_s - wx_f))) / scale_wx
    out["reduce_rows_rel_err"] = err_rows
    out["reduce_wx_rel_err"] = err_wx
    ok &= err_rows <= 1e-4 and err_wx <= 1e-4

    # --- reduce timing ---
    out["reduce_full_ms"] = round(timed(
        lambda a: pk.lowrank_stationary_reduce(x, ls, a, Bf, "matern25"), A),
        2)
    out["reduce_sym_ms"] = round(timed(
        lambda a: pk.lowrank_stationary_reduce_sym(x, ls, a, Bf, "matern25"),
        A), 2)
    out["reduce_speedup"] = round(out["reduce_full_ms"]
                                  / out["reduce_sym_ms"], 3)

    # --- fused kr reduce (production backward since round 3): parity of all
    # three outputs vs {full-grid reduce, on-chip dense (os·K) @ A} ---
    rows_k, wx_k, KA = pk.lowrank_stationary_reduce_sym_kr(
        x, ls, os_, A, Bf, "matern25")
    err_rows_k = float(jnp.max(jnp.abs(rows_k - rows_f))) / scale
    err_wx_k = float(jnp.max(jnp.abs(wx_k - wx_f))) / scale_wx
    Kdense = (pk.xla_kernel_matrix(x, x, ls, "matern25")
              * os_[:, None, None])
    KA_ref = jnp.einsum("bij,bjr->bir", Kdense, A,
                        precision=jax.lax.Precision.HIGHEST)
    err_ka = float(jnp.max(jnp.abs(KA - KA_ref))
                   / (jnp.max(jnp.abs(KA_ref)) + 1e-30))
    out["kr_rows_rel_err"] = err_rows_k
    out["kr_wx_rel_err"] = err_wx_k
    out["kr_ka_rel_err"] = err_ka
    # ka is a bf16-precision-class contraction (see kernel comment)
    ok &= err_rows_k <= 1e-4 and err_wx_k <= 1e-4 and err_ka <= 2e-2
    # stability (the Mosaic-revisit class of bug is nondeterministic)
    for _ in range(2):
        r2, w2, k2 = pk.lowrank_stationary_reduce_sym_kr(
            x, ls, os_, A, Bf, "matern25")
        ok &= float(jnp.max(jnp.abs(r2 - rows_k))) == 0.0
        ok &= float(jnp.max(jnp.abs(w2 - wx_k))) == 0.0
        ok &= float(jnp.max(jnp.abs(k2 - KA))) == 0.0
    out["kr_ms"] = round(timed(
        lambda a: pk.lowrank_stationary_reduce_sym_kr(x, ls, os_, a, Bf,
                                                      "matern25"), A), 2)
    # what the kr pass replaces: sym reduce + separate bf16 stack matmul
    Ks_bf16 = pk.scaled_kernel_stack_sym(x, ls, os_, "matern25",
                                         out_dtype=jnp.bfloat16)

    # the stack must be a jit ARGUMENT — as a captured constant it embeds
    # 840 MB into the program and blows the remote compiler's body limit
    @jax.jit
    def _old_pair_chain(a0, Ks):
        a = a0
        for _ in range(6):
            r, w = pk.lowrank_stationary_reduce_sym(x, ls, a, Bf, "matern25")
            KR = jnp.matmul(Ks.astype(jnp.float32), a,
                            precision=jax.lax.Precision.HIGHEST)
            a = a + (0.0 * (r[0, 0] + KR[0, 0, 0])).astype(a.dtype)
        return a

    o1 = _old_pair_chain(A, Ks_bf16)
    _sync(o1)
    t0 = time.time()
    o1 = _old_pair_chain(o1, Ks_bf16)
    _sync(o1)
    out["old_pair_ms"] = round((time.time() - t0) / 6 * 1e3, 2)
    out["kr_vs_old_pair_speedup"] = round(out["old_pair_ms"] / out["kr_ms"],
                                          3)

    # --- streamed-K reduce (VERDICT r4 lever: dprofile recovered from the
    # HBM-resident stack instead of re-evaluated): parity, boundary-block
    # soundness, Mosaic stability, timing vs the kr recompute pass ---
    rows_st, wx_st, KA_st = pk.lowrank_stationary_reduce_sym_krs(
        x, ls, os_, A, Bf, Ks_bf16, "matern25")
    err_rows_st = float(jnp.max(jnp.abs(rows_st - rows_f))) / scale
    err_wx_st = float(jnp.max(jnp.abs(wx_st - wx_f))) / scale_wx
    err_ka_st = float(jnp.max(jnp.abs(KA_st - KA_ref))
                      / (jnp.max(jnp.abs(KA_ref)) + 1e-30))
    out["krs_rows_rel_err"] = err_rows_st
    out["krs_wx_rel_err"] = err_wx_st
    out["krs_ka_rel_err"] = err_ka_st
    # dprofile inherits the bf16 stack's rounding (documented class)
    ok &= err_rows_st <= 2e-2 and err_wx_st <= 2e-2 and err_ka_st <= 2e-2
    for _ in range(2):
        r3, w3, k3 = pk.lowrank_stationary_reduce_sym_krs(
            x, ls, os_, A, Bf, Ks_bf16, "matern25")
        ok &= float(jnp.max(jnp.abs(r3 - rows_st))) == 0.0
        ok &= float(jnp.max(jnp.abs(w3 - wx_st))) == 0.0
        ok &= float(jnp.max(jnp.abs(k3 - KA_st))) == 0.0
    # stack as a jit ARGUMENT (captured constant would embed 840 MB into
    # the remote-compile body — HTTP 413, same as _old_pair_chain)
    @jax.jit
    def _krs_chain(a0, Ks):
        a = a0
        for _ in range(6):
            r, w, k = pk.lowrank_stationary_reduce_sym_krs(
                x, ls, os_, a, Bf, Ks, "matern25")
            a = a + (0.0 * (r[0, 0] + k[0, 0, 0])).astype(a.dtype)
        return a

    o2 = _krs_chain(A, Ks_bf16)
    _sync(o2)
    t0 = time.time()
    o2 = _krs_chain(o2, Ks_bf16)
    _sync(o2)
    out["krs_ms"] = round((time.time() - t0) / 6 * 1e3, 2)
    out["krs_vs_kr_speedup"] = round(out["kr_ms"] / out["krs_ms"], 3)
    out["krs_vs_old_pair_speedup"] = round(
        out["old_pair_ms"] / out["krs_ms"], 3)

    # boundary blocks on real Mosaic (n not a multiple of the 512 tile —
    # the n=20000 production case; the stack is unpadded, so whatever the
    # DMA fetches past n must be masked in-tile)
    nb = 2080
    xb = x[:nb]
    Ab, Bb = A[:, :nb], Bf[:, :nb]
    Ksb = pk.scaled_kernel_stack_sym(xb, ls, os_, "matern25",
                                     out_dtype=jnp.bfloat16)
    rows_b, wx_b, KA_b = pk.lowrank_stationary_reduce_sym_krs(
        xb, ls, os_, Ab, Bb, Ksb, "matern25")
    rows_bf, wx_bf = pk.lowrank_stationary_reduce(xb, ls, Ab, Bb, "matern25")
    Kdb = (pk.xla_kernel_matrix(xb, xb, ls, "matern25") * os_[:, None, None])
    KAb_ref = jnp.einsum("bij,bjr->bir", Kdb, Ab,
                         precision=jax.lax.Precision.HIGHEST)
    sb = float(jnp.max(jnp.abs(rows_bf))) + 1e-30
    sbw = float(jnp.max(jnp.abs(wx_bf))) + 1e-30
    err_edge = max(
        float(jnp.max(jnp.abs(rows_b - rows_bf))) / sb,
        float(jnp.max(jnp.abs(wx_b - wx_bf))) / sbw,
        float(jnp.max(jnp.abs(KA_b - KAb_ref))
              / (jnp.max(jnp.abs(KAb_ref)) + 1e-30)))
    out["krs_edge_n"] = nb
    out["krs_edge_rel_err"] = err_edge
    ok &= err_edge <= 2e-2 and np.isfinite(err_edge)

    # QR-precision regression check on the REAL chip (VERDICT r4 item 7):
    # CPU tests cannot observe the TPU matmul default, so this is the one
    # place the round-4 fix (models/projected.py QR under
    # default_matmul_precision("highest")) is verified on hardware. Without
    # the fix, bf16-grade passes give ortho_err ~1e-3; with it, ~1e-7.
    p_mix, q_mix = 25, 8
    rng = np.random.default_rng(0)
    H0 = jnp.asarray(np.linalg.qr(rng.standard_normal((p_mix, p_mix)))[0]
                     @ np.diag(np.linspace(2.0, 0.1, p_mix)), jnp.float32)
    from projected_lmc_tpu.models.projected import LMCMixingMatrix
    mix = LMCMixingMatrix(H0, jnp.eye(q_mix, dtype=jnp.float32)[:q_mix],
                          bulk=True)
    Qm, _, Qo = jax.jit(lambda m: m.QR())(mix)
    # measure in host fp64: an on-device Q^T Q itself runs at the TPU's
    # bf16-grade default and would report ~1e-3 for a perfect Q (the first
    # chip run of this check tripped exactly that)
    Qn = np.asarray(Qm, np.float64)
    qr_err = float(np.abs(Qn.T @ Qn - np.eye(Qn.shape[1])).max())
    if Qo is not None:
        qr_err = max(qr_err, float(np.abs(
            Qn.T @ np.asarray(Qo, np.float64)).max()))
    out["qr_ortho_err_onchip"] = qr_err
    out["qr_ortho_ok"] = bool(qr_err < 1e-5)
    ok &= qr_err < 1e-5

    out["parity_ok"] = bool(ok)  # np.isfinite makes `ok` an np.bool_
    print(json.dumps(out))
    return 0 if ok else 1


if __name__ == "__main__":
    sys.exit(main())
