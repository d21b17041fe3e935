"""Fused stationary-kernel exact-LMC MLL (ops/fused_mll.py) vs the composed
path (kernels.stationary_kernel_matrix → iterative.lmc_pcg_log_prob).

Both run the identical estimator on the identical probes, so values and
gradients must agree to numerical precision — this is an algebra-refactoring
check, not a statistical one. The Pallas tile kernels are checked in
interpret mode against the dense XLA references.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from projected_lmc_tpu import kernels as kmod
from projected_lmc_tpu.ops import fused_mll
from projected_lmc_tpu.ops import iterative as it
from projected_lmc_tpu.ops import pallas_kernels as pk


def make_problem(n=48, t=5, q=3, d=2, seed=0, dtype=jnp.float64):
    rng = np.random.default_rng(seed)
    x = jnp.asarray(rng.uniform(-1, 1, (n, d)), dtype)
    ls = jnp.asarray(rng.uniform(0.4, 1.5, (q, 1, d)), dtype)
    os_ = jnp.asarray(rng.uniform(0.5, 2.0, (q,)), dtype)
    H = jnp.asarray(rng.standard_normal((t, q)), dtype)
    A = rng.standard_normal((t, t)) * 0.1
    St = jnp.asarray(A @ A.T + 0.5 * np.eye(t), dtype)
    Y = jnp.asarray(rng.standard_normal((n, t)), dtype)
    key = jax.random.PRNGKey(3)
    k1, k2 = jax.random.split(key)
    s, rank = 4, 16
    eps = jax.random.normal(k1, (s, n, t), dtype)
    xi = jax.random.normal(k2, (s, q, rank), dtype)
    return x, ls, os_, H, St, Y, eps, xi, rank


def composed_ll(x, ls, os_, H, St, Y, eps, xi, rank, kind="matern25",
                cg=(200, 1e-12)):
    Ks = kmod.stationary_kernel_matrix(x, x, ls, kind, False, None) \
        * os_[:, None, None]
    return it.lmc_pcg_log_prob(Ks, H, St, Y, eps, xi, None, cg[0], cg[1],
                               False, rank)


def fused_ll(x, ls, os_, H, St, Y, eps, xi, rank, kind="matern25"):
    return fused_mll.lmc_pcg_log_prob_stationary(
        jax.lax.stop_gradient(x), ls, os_, H, St, Y, eps, xi, None, kind,
        200, 1e-12, False, rank)


class TestFusedVsComposed:
    @pytest.mark.parametrize("kind", ["rbf", "matern25", "matern15"])
    def test_value_identical(self, kind):
        args = make_problem()
        a = float(composed_ll(*args, kind=kind))
        b = float(fused_ll(*args, kind=kind))
        np.testing.assert_allclose(b, a, rtol=1e-10)

    @pytest.mark.parametrize("kind", ["rbf", "matern25"])
    def test_gradients_identical(self, kind):
        """Same estimator, same probes — the backward's low-rank refactoring
        must reproduce the composed path's gradients exactly (fp64)."""
        x, ls, os_, H, St, Y, eps, xi, rank = make_problem()
        gc = jax.grad(lambda *a: composed_ll(*a, eps, xi, rank, kind=kind),
                      argnums=(1, 2, 3, 4, 5))(x, ls, os_, H, St, Y)
        gf = jax.grad(lambda *a: fused_ll(*a, eps, xi, rank, kind=kind),
                      argnums=(1, 2, 3, 4, 5))(x, ls, os_, H, St, Y)
        for a, b, name in zip(gc, gf, ["ls", "os", "H", "St", "Y"]):
            np.testing.assert_allclose(
                np.asarray(b), np.asarray(a), rtol=1e-7, atol=1e-9,
                err_msg=f"cotangent mismatch for {name}")

    def test_scalar_lengthscale(self):
        """Non-ARD (q,1,1) lengthscale with d>1 inputs: the dls reduction
        sums over feature dims (round-1 advisor finding, kept covered)."""
        x, _, os_, H, St, Y, eps, xi, rank = make_problem(d=3)
        rng = np.random.default_rng(7)
        ls = jnp.asarray(rng.uniform(0.5, 1.2, (3, 1, 1)), x.dtype)
        gc = jax.grad(lambda l: composed_ll(x, l, os_, H, St, Y, eps, xi,
                                            rank))(ls)
        gf = jax.grad(lambda l: fused_ll(x, l, os_, H, St, Y, eps, xi,
                                         rank))(ls)
        np.testing.assert_allclose(np.asarray(gf), np.asarray(gc), rtol=1e-7)

    def test_model_routes_through_fused(self):
        """MultitaskGPModel LMC: fused-spec route (use_pallas=True kernels)
        equals the composed route (use_pallas=False) in value and parameter
        gradients."""
        from projected_lmc_tpu.models.multitask import (MultitaskGPModel,
                                                        _fused_stationary_spec)
        rng = np.random.default_rng(1)
        n, t, q = 40, 4, 2
        X = rng.uniform(-1, 1, (n, 3))
        Y = rng.standard_normal((n, t))
        kw = dict(n_tasks=t, n_latents=q, model_type="LMC",
                  kernel_type="matern", fix_diagonal=True, seed=0)
        m_fused = MultitaskGPModel(X, Y, **kw)
        m_comp = MultitaskGPModel(X, Y, **kw)
        m_comp = m_comp.replace(
            covar_module=m_comp.covar_module.replace(use_pallas=False))
        assert _fused_stationary_spec(m_fused.covar_module, 3) is not None
        assert _fused_stationary_spec(m_comp.covar_module, 3) is None
        key = jax.random.PRNGKey(0)
        kwargs = dict(key=key, iterative=True, max_cg_iters=200,
                      cg_tol=1e-12, precond_rank=16, num_probes=4)
        v1 = float(m_fused.mll(**kwargs))
        v2 = float(m_comp.mll(**kwargs))
        np.testing.assert_allclose(v1, v2, rtol=1e-10)

        def loss(raw_ls, covar_factor, model):
            m = model.replace(
                covar_module=model.covar_module.replace(
                    raw_lengthscale=raw_ls),
                covar_factor=covar_factor)
            return m.mll(**kwargs)

        g1 = jax.grad(loss, argnums=(0, 1))(
            m_fused.covar_module.raw_lengthscale, m_fused.covar_factor,
            m_fused)
        g2 = jax.grad(loss, argnums=(0, 1))(
            m_comp.covar_module.raw_lengthscale, m_comp.covar_factor, m_comp)
        for a, b in zip(g1, g2):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       rtol=1e-6, atol=1e-10)


class TestInt8Matvec:
    """int8-quantized CG path: operator noise must stay in the documented
    ~1% class, and the fused int8 MLL must track the fp64 composed dense
    reference in value and gradient direction."""

    def test_quantize_matvec_error(self):
        x, ls, os_, H, St, Y, eps, xi, rank = make_problem(n=96)
        Ks = kmod.stationary_kernel_matrix(x, x, ls, "matern25", False, None) \
            * os_[:, None, None]
        Kq, ks = it.quantize_stack_int8(Ks)
        V = Y[None]
        exact = it.lmc_matvec(Ks, H, St, V)
        quant = it.lmc_matvec_int8(Kq, ks, H, St, V)
        rel = float(jnp.max(jnp.abs(quant - exact))
                    / jnp.max(jnp.abs(exact)))
        # max-abs is the pessimistic norm (entrywise errors don't cancel);
        # the 2-norm operator noise is the ~1% documented class
        assert rel < 4e-2, rel

    def test_fused_int8_value_and_grads(self):
        """Fused int8 vs fp64 composed at TRAINING tolerances (the int8
        matvec's dynamic requantization is slightly nonlinear in V, so CG
        cannot contract to 1e-12 — int8 is a training-tolerance mode; the
        same probes + same tolerance isolate the quantization effect).

        Thresholds reflect the MEASURED quantization bias (results/
        PERF_NOTES.md "precision floor"): the lengthscale gradient is the
        most noise-sensitive direction (cancellation between the data and
        trace terms) — cosine ~0.81 on this problem; the other parameter
        gradients stay well-aligned."""
        x, ls, os_, H, St, Y, eps, xi, rank = make_problem()

        def f_ref(ls_, os2, H_, St_, Y_):
            return composed_ll(x, ls_, os2, H_, St_, Y_, eps, xi, rank,
                               cg=(32, 1e-3))

        def f_int8(ls_, os2, H_, St_, Y_):
            return fused_mll.lmc_pcg_log_prob_stationary(
                jax.lax.stop_gradient(x), ls_, os2, H_, St_, Y_, eps, xi,
                None, "matern25", 32, 1e-3, False, rank, True)

        v_ref = float(f_ref(ls, os_, H, St, Y))
        v_q = float(f_int8(ls, os_, H, St, Y))
        assert abs(v_q - v_ref) / abs(v_ref) < 2e-2, (v_q, v_ref)
        g_ref = jax.grad(f_ref, argnums=(0, 1, 2, 3, 4))(ls, os_, H, St, Y)
        g_q = jax.grad(f_int8, argnums=(0, 1, 2, 3, 4))(ls, os_, H, St, Y)
        thresholds = {"ls": 0.7, "os": 0.95, "H": 0.95, "St": 0.95,
                      "Y": 0.95}
        for a, b, name in zip(g_ref, g_q, ["ls", "os", "H", "St", "Y"]):
            a, b = np.asarray(a).ravel(), np.asarray(b).ravel()
            cos = float(a @ b / (np.linalg.norm(a) * np.linalg.norm(b)
                                 + 1e-30))
            assert cos > thresholds[name], (name, cos)

    def test_int8_matvec_single_rhs(self):
        """The 2-D (single-RHS) branch of lmc_matvec_int8 equals the batched
        branch's row."""
        x, ls, os_, H, St, Y, eps, xi, rank = make_problem(n=64)
        Ks = kmod.stationary_kernel_matrix(x, x, ls, "matern25", False,
                                           None) * os_[:, None, None]
        Kq, ks = it.quantize_stack_int8(Ks)
        single = it.lmc_matvec_int8(Kq, ks, H, St, Y)
        batched = it.lmc_matvec_int8(Kq, ks, H, St, Y[None])[0]
        np.testing.assert_allclose(np.asarray(single), np.asarray(batched),
                                   rtol=1e-6, atol=1e-8)

    def test_model_int8_composed_route(self):
        """matvec_int8 through the composed (use_pallas=False) model route —
        quantize-on-the-fly from the built stack."""
        from projected_lmc_tpu.models.multitask import MultitaskGPModel
        rng = np.random.default_rng(6)
        n, t, q = 48, 4, 2
        X = rng.uniform(-1, 1, (n, 3))
        Y = rng.standard_normal((n, t))
        m = MultitaskGPModel(X, Y, n_tasks=t, n_latents=q, model_type="LMC",
                             kernel_type="matern", fix_diagonal=True, seed=0)
        m = m.replace(covar_module=m.covar_module.replace(use_pallas=False))
        base = dict(key=jax.random.PRNGKey(0), iterative=True,
                    max_cg_iters=32, cg_tol=1e-3, precond_rank=16,
                    num_probes=4)
        v_ref = float(m.mll(**base))
        v_q = float(m.mll(matvec_int8=True, **base))
        np.testing.assert_allclose(v_q, v_ref, rtol=2e-2)
        g = jax.grad(lambda raw: m.replace(
            covar_module=m.covar_module.replace(raw_lengthscale=raw)
        ).mll(matvec_int8=True, **base))(m.covar_module.raw_lengthscale)
        assert np.all(np.isfinite(np.asarray(g)))

    def test_model_int8_route(self):
        """MultitaskGPModel LMC with matvec_int8 stays close to the exact
        composed route at training tolerances."""
        from projected_lmc_tpu.models.multitask import MultitaskGPModel
        rng = np.random.default_rng(5)
        n, t, q = 48, 4, 2
        X = rng.uniform(-1, 1, (n, 3))
        Y = rng.standard_normal((n, t))
        kw = dict(n_tasks=t, n_latents=q, model_type="LMC",
                  kernel_type="matern", fix_diagonal=True, seed=0)
        m = MultitaskGPModel(X, Y, **kw)
        key = jax.random.PRNGKey(0)
        base = dict(key=key, iterative=True, max_cg_iters=32, cg_tol=1e-3,
                    precond_rank=16, num_probes=4)
        v_ref = float(m.mll(**base))
        v_q = float(m.mll(matvec_int8=True, **base))
        np.testing.assert_allclose(v_q, v_ref, rtol=2e-2)


class TestPallasInterpret:
    """Tile kernels vs their dense XLA references (interpret mode, fp32)."""

    def test_scaled_stack(self):
        rng = np.random.default_rng(0)
        x = jnp.asarray(rng.uniform(-1, 1, (70, 3)).astype(np.float32))
        ls = jnp.asarray(rng.uniform(0.5, 1.5, (2, 1, 3)).astype(np.float32))
        os_ = jnp.asarray(np.float32([0.7, 1.9]))
        got = pk.scaled_kernel_stack(x, x, ls, os_, "matern25", True)
        want = pk.xla_kernel_matrix(x, x, ls, "matern25") * os_[:, None, None]
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   rtol=1e-5, atol=1e-6)

    def test_quantized_stack(self):
        rng = np.random.default_rng(2)
        x = jnp.asarray(rng.uniform(-1, 1, (70, 3)).astype(np.float32))
        ls = jnp.asarray(rng.uniform(0.5, 1.5, (2, 1, 3)).astype(np.float32))
        got = pk.quantized_kernel_stack(x, x, ls, "matern25", interpret=True)
        assert got.dtype == jnp.int8
        want = pk.xla_kernel_matrix(x, x, ls, "matern25")
        recon = got.astype(jnp.float32) / 127.0
        # fast-exp (2e-5) + int8 rounding (1/254): absolute error < 1/127
        np.testing.assert_allclose(np.asarray(recon), np.asarray(want),
                                   atol=1.01 / 254)

    def test_scaled_stack_sym(self):
        """Triangular-grid symmetric builder (+ aliased mirror pass) ==
        dense reference, across tile-boundary sizes."""
        rng = np.random.default_rng(3)
        for n in (70, 300):
            x = jnp.asarray(rng.uniform(-1, 1, (n, 3)).astype(np.float32))
            ls = jnp.asarray(rng.uniform(0.5, 1.5, (2, 1, 3))
                             .astype(np.float32))
            os_ = jnp.asarray(np.float32([0.7, 1.9]))
            got = pk.scaled_kernel_stack_sym(x, ls, os_, "matern25",
                                             interpret=True)
            want = pk.xla_kernel_matrix(x, x, ls, "matern25") \
                * os_[:, None, None]
            np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                       rtol=1e-5, atol=2e-6)

    def test_lowrank_reduce_sym_matches_full(self):
        """Triangular-grid symmetric reduce == full-grid reduce on a
        symmetric low-rank cotangent (the fused backward's construction)."""
        rng = np.random.default_rng(4)
        n, d, B, r2 = 90, 2, 3, 3
        x = jnp.asarray(rng.uniform(-1, 1, (n, d)).astype(np.float32))
        ls = jnp.asarray(rng.uniform(0.5, 1.5, (B, 1, d)).astype(np.float32))
        U = rng.standard_normal((B, n, r2)).astype(np.float32)
        V = rng.standard_normal((B, n, r2)).astype(np.float32)
        A = jnp.asarray(np.concatenate([U, V], -1))
        Bf = jnp.asarray(np.concatenate([V, U], -1))   # A Bfᵀ symmetric
        rows_s, wx_s = pk.lowrank_stationary_reduce_sym(
            x, ls, A, Bf, "matern25", interpret=True)
        rows_f, wx_f = pk.lowrank_stationary_reduce(
            x, ls, A, Bf, "matern25", interpret=True)
        np.testing.assert_allclose(np.asarray(rows_s), np.asarray(rows_f),
                                   rtol=1e-5, atol=1e-5)
        np.testing.assert_allclose(np.asarray(wx_s), np.asarray(wx_f),
                                   rtol=1e-5, atol=1e-5)

    def test_kr_routing(self):
        """_use_kr_fused: env override wins; otherwise kr engages exactly
        where the resident-accumulator sym reduce would not fit VMEM."""
        from projected_lmc_tpu.ops import fused_mll as fm
        small_x = np.zeros((4096, 4), np.float32)
        big_x = np.zeros((20480, 4), np.float32)
        A_small = np.zeros((4, 4096, 17), np.float32)
        A_big = np.zeros((4, 20480, 17), np.float32)
        assert fm._sym_reduce_fits_vmem(small_x, A_small)
        assert not fm._sym_reduce_fits_vmem(big_x, A_big)
        import os
        old = os.environ.pop("PLMC_KR_FUSED", None)
        try:
            assert not fm._use_kr_fused(small_x, A_small)
            assert fm._use_kr_fused(big_x, A_big)
            # env override is read at trace time, not import time (ADVICE r3)
            os.environ["PLMC_KR_FUSED"] = "1"
            assert fm._use_kr_fused(small_x, A_small)
            os.environ["PLMC_KR_FUSED"] = "0"
            assert not fm._use_kr_fused(big_x, A_big)
        finally:
            if old is None:
                os.environ.pop("PLMC_KR_FUSED", None)
            else:
                os.environ["PLMC_KR_FUSED"] = old

    def test_lowrank_reduce_sym_kr(self):
        """The fully-fused backward kernel (rows + wx + KA in one pass,
        perf lever 2) == {full-grid reduce, dense (os·K) @ A}."""
        rng = np.random.default_rng(9)
        n, d, B, r2 = 200, 3, 2, 4
        x = jnp.asarray(rng.uniform(-1, 1, (n, d)).astype(np.float32))
        ls = jnp.asarray(rng.uniform(0.5, 1.5, (B, 1, d)).astype(np.float32))
        os_ = jnp.asarray(rng.uniform(0.5, 2.0, (B,)).astype(np.float32))
        U = rng.standard_normal((B, n, r2)).astype(np.float32)
        V = rng.standard_normal((B, n, r2)).astype(np.float32)
        A = jnp.asarray(np.concatenate([U, V], -1))
        Bf = jnp.asarray(np.concatenate([V, U], -1))   # A Bfᵀ symmetric
        for kind in ("matern25", "rbf"):
            rows, wx, KA = pk.lowrank_stationary_reduce_sym_kr(
                x, ls, os_, A, Bf, kind, interpret=True)
            rows_f, wx_f = pk.lowrank_stationary_reduce(
                x, ls, A, Bf, kind, interpret=True)
            K = pk.xla_kernel_matrix(x, x, ls, kind) * os_[:, None, None]
            KA_ref = jnp.einsum("bij,bjr->bir", K, A)
            np.testing.assert_allclose(np.asarray(rows), np.asarray(rows_f),
                                       rtol=1e-4, atol=1e-4)
            np.testing.assert_allclose(np.asarray(wx), np.asarray(wx_f),
                                       rtol=1e-4, atol=1e-4)
            # fast exp2 (rel ~2e-5) accumulated over n=200 columns
            np.testing.assert_allclose(np.asarray(KA), np.asarray(KA_ref),
                                       rtol=2e-3, atol=2e-2)

    def test_lowrank_reduce_sym_krs(self):
        """Streamed-K backward (VERDICT r4 lever): reading the os-scaled
        stack and recovering dprofile algebraically == the recompute kernel,
        for every stationary kind, including a non-tile-multiple n (the K
        stack is NOT padded — boundary blocks are masked in-tile)."""
        rng = np.random.default_rng(11)
        d, B, r2 = 3, 2, 4
        for n in (200, 130):           # 130: 128-tile boundary block
            x = jnp.asarray(rng.uniform(-1, 1, (n, d)).astype(np.float32))
            ls = jnp.asarray(
                rng.uniform(0.5, 1.5, (B, 1, d)).astype(np.float32))
            os_ = jnp.asarray(rng.uniform(0.5, 2.0, (B,)).astype(np.float32))
            U = rng.standard_normal((B, n, r2)).astype(np.float32)
            V = rng.standard_normal((B, n, r2)).astype(np.float32)
            A = jnp.asarray(np.concatenate([U, V], -1))
            Bf = jnp.asarray(np.concatenate([V, U], -1))
            for kind in ("matern25", "matern15", "matern05", "rbf"):
                Ks = pk.xla_kernel_matrix(x, x, ls, kind) \
                    * os_[:, None, None]
                rows, wx, KA = pk.lowrank_stationary_reduce_sym_krs(
                    x, ls, os_, A, Bf, Ks, kind, interpret=True)
                rows_f, wx_f = pk.lowrank_stationary_reduce(
                    x, ls, A, Bf, kind, interpret=True)
                KA_ref = jnp.einsum("bij,bjr->bir", Ks, A)
                np.testing.assert_allclose(
                    np.asarray(rows), np.asarray(rows_f),
                    rtol=1e-3, atol=5e-3, err_msg=f"{kind} n={n}")
                np.testing.assert_allclose(
                    np.asarray(wx), np.asarray(wx_f),
                    rtol=1e-3, atol=5e-3, err_msg=f"{kind} n={n}")
                np.testing.assert_allclose(
                    np.asarray(KA), np.asarray(KA_ref),
                    rtol=2e-3, atol=2e-2, err_msg=f"{kind} n={n}")

    def test_lowrank_reduce_sym_krs_bf16_stack(self):
        """bf16 stack: dprofile inherits the stack's rounding — the
        documented accuracy class (same stack the CG matvecs consume)."""
        rng = np.random.default_rng(13)
        n, d, B, r2 = 200, 3, 2, 4
        x = jnp.asarray(rng.uniform(-1, 1, (n, d)).astype(np.float32))
        ls = jnp.asarray(rng.uniform(0.5, 1.5, (B, 1, d)).astype(np.float32))
        os_ = jnp.asarray(rng.uniform(0.5, 2.0, (B,)).astype(np.float32))
        U = rng.standard_normal((B, n, r2)).astype(np.float32)
        V = rng.standard_normal((B, n, r2)).astype(np.float32)
        A = jnp.asarray(np.concatenate([U, V], -1))
        Bf = jnp.asarray(np.concatenate([V, U], -1))
        Ksf = pk.xla_kernel_matrix(x, x, ls, "matern25") * os_[:, None, None]
        rows, wx, KA = pk.lowrank_stationary_reduce_sym_krs(
            x, ls, os_, A, Bf, Ksf.astype(jnp.bfloat16), "matern25",
            interpret=True)
        rows_f, wx_f = pk.lowrank_stationary_reduce(
            x, ls, A, Bf, "matern25", interpret=True)
        KA_ref = jnp.einsum("bij,bjr->bir", Ksf, A)
        np.testing.assert_allclose(np.asarray(rows), np.asarray(rows_f),
                                   rtol=2e-2, atol=5e-2)
        np.testing.assert_allclose(np.asarray(wx), np.asarray(wx_f),
                                   rtol=2e-2, atol=5e-2)
        np.testing.assert_allclose(np.asarray(KA), np.asarray(KA_ref),
                                   rtol=2e-2, atol=2e-1)

    def test_krs_routing(self):
        """PLMC_KR_STREAM: default OFF (measured a wash vs the recompute kr
        pass on-chip — see _use_kr_stream), env-forceable at trace time,
        never engages for int8 stacks."""
        from projected_lmc_tpu.ops import fused_mll as fm
        import os as _os
        bf = jnp.zeros((2, 8, 8), jnp.bfloat16)
        i8 = jnp.zeros((2, 8, 8), jnp.int8)
        old = _os.environ.pop("PLMC_KR_STREAM", None)
        try:
            assert not fm._use_kr_stream(bf)
            assert not fm._use_kr_stream(i8)
            _os.environ["PLMC_KR_STREAM"] = "1"
            assert fm._use_kr_stream(bf)
            assert not fm._use_kr_stream(i8)
            _os.environ["PLMC_KR_STREAM"] = "0"
            assert not fm._use_kr_stream(bf)
        finally:
            if old is None:
                _os.environ.pop("PLMC_KR_STREAM", None)
            else:
                _os.environ["PLMC_KR_STREAM"] = old

    def test_lowrank_reduce(self):
        rng = np.random.default_rng(1)
        n, d, B, r = 90, 2, 3, 5
        x = jnp.asarray(rng.uniform(-1, 1, (n, d)).astype(np.float32))
        ls = jnp.asarray(rng.uniform(0.5, 1.5, (B, 1, d)).astype(np.float32))
        A = jnp.asarray(rng.standard_normal((B, n, r)).astype(np.float32))
        Bf = jnp.asarray(rng.standard_normal((B, n, r)).astype(np.float32))
        rows, wx = pk.lowrank_stationary_reduce(x, ls, A, Bf, "rbf",
                                                interpret=True)
        a = x[None] / ls
        n1 = jnp.sum(a * a, axis=-1)
        d2 = jnp.maximum(n1[..., :, None] + n1[..., None, :]
                         - 2.0 * jnp.matmul(a, jnp.swapaxes(a, -1, -2)), 0.0)
        W = jnp.einsum("bik,bjk->bij", A, Bf) * pk._dprofile("rbf", d2)
        # the Pallas pass uses the fast exp2 sequence (rel err ~2e-5);
        # row-reductions over n=90 accumulate it to ~1e-3 absolute
        np.testing.assert_allclose(np.asarray(rows),
                                   np.asarray(jnp.sum(W, -1)),
                                   rtol=1e-3, atol=5e-3)
        np.testing.assert_allclose(np.asarray(wx),
                                   np.asarray(jnp.einsum("bij,jd->bid", W, x)),
                                   rtol=1e-3, atol=5e-3)
