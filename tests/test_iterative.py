"""Iterative (CG + SLQ) exact-LMC MLL vs the dense Woodbury path.

The dense path (ops/woodbury.py) is itself pinned against brute-force dense
log-probs in test_mlls.py, so it serves as the oracle here. The CG solves are
run to tight tolerance (exact in the small-n limit); the SLQ logdet and the
Hutchinson gradient terms are stochastic, so value checks are tight where
deterministic (quadratic form) and statistical (many probes) where not.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from projected_lmc_tpu.ops import woodbury as wb
from projected_lmc_tpu.ops import iterative as it


def make_problem(n=40, t=5, q=2, seed=0, dtype=jnp.float64):
    rng = np.random.default_rng(seed)
    X = rng.uniform(-1, 1, (n, 2))
    Ks = []
    for b in range(q):
        d2 = ((X[:, None, :] - X[None, :, :]) ** 2).sum(-1)
        Ks.append(np.exp(-d2 / (2 * (0.5 + 0.3 * b) ** 2)))
    Ks = jnp.asarray(np.stack(Ks), dtype)
    H = jnp.asarray(rng.standard_normal((t, q)), dtype)
    A = rng.standard_normal((t, t)) * 0.1
    St = jnp.asarray(A @ A.T + 0.5 * np.eye(t), dtype)
    Y = jnp.asarray(rng.standard_normal((n, t)), dtype)
    return Ks, H, St, Y


class TestMatvec:
    def test_matvec_matches_dense(self):
        Ks, H, St, Y = make_problem()
        n, t = Y.shape
        q = Ks.shape[0]
        dense = np.zeros((n * t, n * t))
        for b in range(q):
            dense += np.kron(np.asarray(Ks[b]),
                             np.outer(np.asarray(H[:, b]), np.asarray(H[:, b])))
        dense += np.kron(np.eye(n), np.asarray(St))
        out = np.asarray(it.lmc_matvec(Ks, H, St, Y))
        ref = (dense @ np.asarray(Y).reshape(-1)).reshape(n, t)
        np.testing.assert_allclose(out, ref, rtol=1e-10)

    def test_pcg_solves(self):
        Ks, H, St, Y = make_problem()
        Md = jnp.clip(it._jacobi_diag(Ks, H, St), 1e-10)
        X = it.batched_pcg(lambda V: it.lmc_matvec(Ks, H, St, V),
                           Y[None], Md, max_iters=400, tol=1e-10)
        recon = it.lmc_matvec(Ks, H, St, X[0])
        np.testing.assert_allclose(np.asarray(recon), np.asarray(Y), atol=1e-7)


class TestLogProb:
    def test_value_matches_dense(self):
        Ks, H, St, Y = make_problem()
        ll_dense = float(wb.lmc_log_prob(Ks, H, St, Y, jitter=0.0))
        key = jax.random.PRNGKey(0)
        probes = it.draw_probes(key, Y.shape[0], Y.shape[1], 32, Y.dtype)
        ll_it = float(it.lmc_iterative_log_prob(Ks, H, St, Y, probes,
                                                400, 1e-10, 30))
        # quad is exact (tight CG); SLQ logdet error is the only gap
        assert abs(ll_it - ll_dense) / abs(ll_dense) < 2e-2, (ll_it, ll_dense)

    def test_gradients_match_dense(self):
        """Hand-derived VJP vs autodiff through the dense path. The logdet
        gradient is a Hutchinson estimate — many probes + loose rtol."""
        Ks, H, St, Y = make_problem(n=30, t=4, q=2)
        key = jax.random.PRNGKey(1)
        probes = it.draw_probes(key, Y.shape[0], Y.shape[1], 1024, Y.dtype)

        g_dense = jax.grad(
            lambda *a: wb.lmc_log_prob(*a, jitter=0.0), argnums=(0, 1, 2, 3)
        )(Ks, H, St, Y)
        g_it = jax.grad(
            lambda K, h, s, y: it.lmc_iterative_log_prob(
                K, h, s, y, probes, 400, 1e-10, 30),
            argnums=(0, 1, 2, 3))(Ks, H, St, Y)

        # dY is deterministic (CG-exact): tight
        np.testing.assert_allclose(np.asarray(g_it[3]), np.asarray(g_dense[3]),
                                   atol=1e-6)
        # the rest carry the stochastic −½Σ⁻¹ estimate: statistical tolerance
        # scaling as 1/√s (verified: the deterministic quad terms match the
        # dense autodiff to 1e-14; dH has the largest Hutchinson variance)
        for a, b, name, tol in [(g_it[0], g_dense[0], "dK", 0.12),
                                (g_it[1], g_dense[1], "dH", 0.35),
                                (g_it[2], g_dense[2], "dSt", 0.12)]:
            a, b = np.asarray(a), np.asarray(b)
            scale = np.abs(b).max()
            err = np.abs(a - b).max() / scale
            assert err < tol, (name, err)

    def test_nystrom_preconditioner_same_solution(self):
        """PCG with the Nyström preconditioner converges to the same MLL and
        gradients as Jacobi (it only changes the iteration count)."""
        Ks, H, St, Y = make_problem(n=50, t=4, q=2)
        probes = it.draw_probes(jax.random.PRNGKey(2), 50, 4, 16, Y.dtype)
        args = (400, 1e-10, 25, False)
        v0 = float(it.lmc_iterative_log_prob(Ks, H, St, Y, probes, *args, 0))
        v1 = float(it.lmc_iterative_log_prob(Ks, H, St, Y, probes, *args, 16))
        assert abs(v0 - v1) / abs(v0) < 1e-8, (v0, v1)
        g0 = jax.grad(lambda K: it.lmc_iterative_log_prob(
            K, H, St, Y, probes, *args, 0))(Ks)
        g1 = jax.grad(lambda K: it.lmc_iterative_log_prob(
            K, H, St, Y, probes, *args, 16))(Ks)
        np.testing.assert_allclose(np.asarray(g1), np.asarray(g0),
                                   rtol=1e-6, atol=1e-10)

    def test_bf16_matvec_close_to_f32(self):
        """The bandwidth-saving bf16 kernel-stack matvec keeps the value
        within ~0.1% and gradients within Hutchinson noise of the fp32 path
        (it is what bench.py runs on the TPU)."""
        Ks, H, St, Y = make_problem(n=40, t=4, q=2, dtype=jnp.float32)
        probes = it.draw_probes(jax.random.PRNGKey(0), 40, 4, 16, jnp.float32)
        v32 = float(it.lmc_iterative_log_prob(Ks, H, St, Y, probes,
                                              200, 1e-3, 25, False))
        v16 = float(it.lmc_iterative_log_prob(Ks, H, St, Y, probes,
                                              200, 1e-3, 25, True))
        assert abs(v16 - v32) / abs(v32) < 5e-3, (v16, v32)
        g32 = jax.grad(lambda K: it.lmc_iterative_log_prob(
            K, H, St, Y, probes, 200, 1e-3, 25, False))(Ks)
        g16 = jax.grad(lambda K: it.lmc_iterative_log_prob(
            K, H, St, Y, probes, 200, 1e-3, 25, True))(Ks)
        rel = float(jnp.abs(g16 - g32).max() / jnp.abs(g32).max())
        assert rel < 0.1, rel

    def test_pcg_quadrature_value_matches_dense(self):
        """The fused PCG+Lanczos-quadrature estimator (probes ~ N(0,M), exact
        logdet M, tridiagonals from the CG coefficients) against the dense
        oracle. With rank ≈ n the preconditioner is near-exact, so even few
        probes give a tight logdet."""
        Ks, H, St, Y = make_problem()
        n, t = Y.shape
        ll_dense = float(wb.lmc_log_prob(Ks, H, St, Y, jitter=0.0))
        k1, k2 = jax.random.split(jax.random.PRNGKey(0))
        s, rank = 8, 32
        eps = jax.random.normal(k1, (s, n, t), Y.dtype)
        xi = jax.random.normal(k2, (s, Ks.shape[0], rank), Y.dtype)
        ll = float(it.lmc_pcg_log_prob(Ks, H, St, Y, eps, xi,
                                       None, 60, 1e-10, False, rank))
        assert abs(ll - ll_dense) / abs(ll_dense) < 2e-2, (ll, ll_dense)

    def test_pcg_quadrature_gradients_match_dense(self):
        """Hand-derived VJP with the M-covariant Hutchinson correction
        (w z̃ᵀ, z̃ = M⁻¹z) vs autodiff through the dense path."""
        Ks, H, St, Y = make_problem(n=30, t=4, q=2)
        n, t = Y.shape
        k1, k2 = jax.random.split(jax.random.PRNGKey(1))
        s, rank = 512, 16
        eps = jax.random.normal(k1, (s, n, t), Y.dtype)
        xi = jax.random.normal(k2, (s, Ks.shape[0], rank), Y.dtype)

        g_dense = jax.grad(
            lambda *a: wb.lmc_log_prob(*a, jitter=0.0), argnums=(0, 1, 2, 3)
        )(Ks, H, St, Y)
        g_it = jax.grad(
            lambda K, h, st, y: it.lmc_pcg_log_prob(
                K, h, st, y, eps, xi, None, 200, 1e-10, False, rank),
            argnums=(0, 1, 2, 3))(Ks, H, St, Y)

        np.testing.assert_allclose(np.asarray(g_it[3]), np.asarray(g_dense[3]),
                                   atol=1e-6)
        # N(0,M) probes concentrate the Hutchinson variance where the
        # preconditioner is loose; tolerances match the Rademacher test's
        for a, b, name, tol in [(g_it[0], g_dense[0], "dK", 0.15),
                                (g_it[1], g_dense[1], "dH", 0.35),
                                (g_it[2], g_dense[2], "dSt", 0.15)]:
            a, b = np.asarray(a), np.asarray(b)
            err = np.abs(a - b).max() / np.abs(b).max()
            assert err < tol, (name, err)

    def test_pcg_quadrature_jit_and_model_entry(self):
        """jit-compiles; the model-level mll routes to it and is finite."""
        from projected_lmc_tpu.models.multitask import MultitaskGPModel
        rng = np.random.default_rng(3)
        X = rng.uniform(-1, 1, (40, 2)).astype(np.float64)
        Y = rng.standard_normal((40, 3)).astype(np.float64)
        m = MultitaskGPModel(X, Y, n_tasks=3, n_latents=2, model_type="LMC",
                             kernel_type="rbf", fix_diagonal=True)
        f = jax.jit(lambda mdl, k: mdl.mll(key=k, iterative=True,
                                           precond_rank=16, num_probes=4,
                                           max_cg_iters=40, cg_tol=1e-8))
        v1 = float(f(m, jax.random.PRNGKey(0)))
        v2 = float(f(m, jax.random.PRNGKey(9)))
        v_dense = float(m.mll(iterative=False))
        assert np.isfinite(v1) and np.isfinite(v2)
        assert abs(v1 - v_dense) / abs(v_dense) < 5e-2, (v1, v_dense)
        assert abs(v1 - v2) / max(abs(v1), 1e-9) < 5e-2

    def test_bench_config_accuracy_vs_dense(self):
        """Pins the EXACT bench hyperparameters (bench.py: max_cg_iters=16,
        cg_tol=2e-2, matvec_bf16=True, precond_rank=256, num_probes=8) at a
        dense-verifiable size: MLL relative error and per-parameter gradient
        cosine vs the dense Woodbury path. Thresholds from a 3-seed
        calibration at n=768 (worst observed: rel_err 8.6e-5, H-cosine 0.91).
        """
        from projected_lmc_tpu.models.multitask import MultitaskGPModel
        from projected_lmc_tpu.module import trainable_mask, partition, combine

        rng = np.random.default_rng(0)
        n, T, q = 768, 7, 4
        X = rng.uniform(-1, 1, (n, 4)).astype(np.float32)
        Y = rng.standard_normal((n, T)).astype(np.float32)
        m = MultitaskGPModel(X, Y, n_tasks=T, n_latents=q, model_type="LMC",
                             kernel_type="matern", mean_type="zero",
                             fix_diagonal=True)
        mask = trainable_mask(m)
        params, static = partition(m, mask)

        def mll_bench(p, key):
            return combine(p, static).mll(
                key=key, iterative=True, max_cg_iters=16, cg_tol=2e-2,
                matvec_bf16=True, precond_rank=256, num_probes=8)

        def mll_dense(p):
            return combine(p, static).mll(iterative=False)

        v_d, g_d = jax.value_and_grad(mll_dense)(params)
        v_b, g_b = jax.value_and_grad(mll_bench)(params, jax.random.PRNGKey(0))
        rel = abs(float(v_b) - float(v_d)) / abs(float(v_d))
        assert rel < 5e-4, f"bench-config MLL rel err {rel}"

        cos_floor = {".covar_factor": 0.85,
                     ".covar_module.raw_lengthscale": 0.95,
                     ".likelihood.raw_noise": 0.99,
                     ".likelihood.raw_task_noises": 0.98}
        paths = [jax.tree_util.keystr(kp) for kp, _ in
                 jax.tree_util.tree_leaves_with_path(g_d)]
        for pth, a, b in zip(paths, jax.tree_util.tree_leaves(g_b),
                             jax.tree_util.tree_leaves(g_d)):
            a = np.asarray(a, np.float64).ravel()
            b = np.asarray(b, np.float64).ravel()
            nb = np.linalg.norm(b)
            if nb < 1e-12:
                continue
            cos = float(a @ b / (np.linalg.norm(a) * nb + 1e-30))
            floor = cos_floor.get(pth, 0.8)
            assert cos > floor, f"{pth}: gradient cosine {cos} < {floor}"

    def test_jit_and_fresh_probes(self):
        """jit-compiles; different probe draws move the value only slightly."""
        Ks, H, St, Y = make_problem(n=25, t=3, q=2, dtype=jnp.float64)
        f = jax.jit(lambda pr: it.lmc_iterative_log_prob(
            Ks, H, St, Y, pr, 200, 1e-8, 25))
        v1 = float(f(it.draw_probes(jax.random.PRNGKey(0), 25, 3, 16, Y.dtype)))
        v2 = float(f(it.draw_probes(jax.random.PRNGKey(7), 25, 3, 16, Y.dtype)))
        assert np.isfinite(v1) and np.isfinite(v2)
        assert abs(v1 - v2) / abs(v1) < 5e-2


class TestICMIterative:
    """Matrix-free exact ICM (icm_pcg_log_prob) vs the dense
    joint-diagonalization oracle (ops/kron.icm_log_prob_chol)."""

    @staticmethod
    def _problem(n=48, t=4, seed=0):
        rng = np.random.default_rng(seed)
        X = rng.uniform(-1, 1, (n, 2))
        d2 = ((X[:, None, :] - X[None, :, :]) ** 2).sum(-1)
        K = jnp.asarray(np.exp(-d2 / (2 * 0.6 ** 2)), jnp.float64)
        F = rng.standard_normal((t, 2))
        B = jnp.asarray(F @ F.T + 0.2 * np.eye(t), jnp.float64)
        A = rng.standard_normal((t, t)) * 0.1
        St = jnp.asarray(A @ A.T + 0.4 * np.eye(t), jnp.float64)
        Y = jnp.asarray(rng.standard_normal((n, t)), jnp.float64)
        return K, B, St, Y

    def test_matvec_matches_dense(self):
        K, B, St, Y = self._problem()
        n, t = Y.shape
        Sigma = (np.kron(np.asarray(K), np.asarray(B))
                 + np.kron(np.eye(n), np.asarray(St)))
        want = (Sigma @ np.asarray(Y).reshape(-1)).reshape(n, t)
        got = np.asarray(it.icm_matvec(K, B, St, Y))
        np.testing.assert_allclose(got, want, rtol=1e-10)

    def test_value_matches_dense(self):
        from projected_lmc_tpu.ops import kron as kron_ops
        K, B, St, Y = self._problem()
        n, t = Y.shape
        ll_dense = float(kron_ops.icm_log_prob_chol(K, B, St, Y))
        k1, k2 = jax.random.split(jax.random.PRNGKey(0))
        s, rank = 8, 32
        eps = jax.random.normal(k1, (s, n, t), Y.dtype)
        xi = jax.random.normal(k2, (s, rank, t), Y.dtype)
        ll = float(it.icm_pcg_log_prob(K, B, St, Y, eps, xi, None,
                                       80, 1e-10, False, rank))
        assert abs(ll - ll_dense) / abs(ll_dense) < 2e-2, (ll, ll_dense)

    def test_gradients_match_dense(self):
        from projected_lmc_tpu.ops import kron as kron_ops
        K, B, St, Y = self._problem(n=30, t=3, seed=1)
        n, t = Y.shape
        k1, k2 = jax.random.split(jax.random.PRNGKey(1))
        s, rank = 512, 16
        eps = jax.random.normal(k1, (s, n, t), Y.dtype)
        xi = jax.random.normal(k2, (s, rank, t), Y.dtype)
        g_dense = jax.grad(kron_ops.icm_log_prob_chol,
                           argnums=(0, 1, 2, 3))(K, B, St, Y)
        g_it = jax.grad(
            lambda k, b, st, y: it.icm_pcg_log_prob(
                k, b, st, y, eps, xi, None, 200, 1e-10, False, rank),
            argnums=(0, 1, 2, 3))(K, B, St, Y)
        np.testing.assert_allclose(np.asarray(g_it[3]),
                                   np.asarray(g_dense[3]), atol=1e-6)
        for a, b, name, tol in [(g_it[0], g_dense[0], "dK", 0.15),
                                (g_it[1], g_dense[1], "dB", 0.15),
                                (g_it[2], g_dense[2], "dSt", 0.15)]:
            a, b = np.asarray(a), np.asarray(b)
            err = np.abs(a - b).max() / np.abs(b).max()
            assert err < tol, (name, err)

    def test_model_routes_large_n_icm(self):
        """MultitaskGPModel ICM with iterative=True routes to the PCG path
        and stays close to the dense MLL; jit-compiles."""
        from projected_lmc_tpu.models.multitask import MultitaskGPModel
        from projected_lmc_tpu.likelihoods import MultitaskGaussianLikelihood
        rng = np.random.default_rng(3)
        X = rng.uniform(-1, 1, (60, 2)).astype(np.float64)
        Y = rng.standard_normal((60, 3)).astype(np.float64)
        lik = MultitaskGaussianLikelihood(num_tasks=3, rank=0)
        m = MultitaskGPModel(X, Y, lik, n_tasks=3, n_latents=2,
                             model_type="ICM", kernel_type="rbf", seed=0)
        f = jax.jit(lambda mdl, k: mdl.mll(key=k, iterative=True,
                                           precond_rank=24, num_probes=6,
                                           max_cg_iters=60, cg_tol=1e-9))
        v_it = float(f(m, jax.random.PRNGKey(0)))
        v_dense = float(m.mll(iterative=False))
        assert abs(v_it - v_dense) / abs(v_dense) < 5e-2, (v_it, v_dense)
