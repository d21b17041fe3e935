"""Unit tests for the L0 linear-algebra ops (cholesky ladder, kron, woodbury)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from projected_lmc_tpu.ops.cholesky import (safe_cholesky, cho_solve,
                                            logdet_from_chol, chol_inverse_diag)
from projected_lmc_tpu.ops import kron as kron_ops
from projected_lmc_tpu.ops import woodbury as wb_ops


def _psd(n, seed=0, jitter=1e-3):
    rng = np.random.default_rng(seed)
    A = rng.standard_normal((n, n))
    return A @ A.T / n + jitter * np.eye(n)


class TestSafeCholesky:
    def test_matches_numpy(self):
        A = jnp.asarray(_psd(16))
        L = safe_cholesky(A)
        np.testing.assert_allclose(np.asarray(L), np.linalg.cholesky(np.asarray(A)),
                                   rtol=1e-10, atol=1e-10)

    def test_batched(self):
        A = jnp.stack([jnp.asarray(_psd(8, seed=s)) for s in range(3)])
        L = safe_cholesky(A)
        np.testing.assert_allclose(np.asarray(L @ jnp.swapaxes(L, -1, -2)),
                                   np.asarray(A), rtol=1e-8, atol=1e-10)

    def test_jitter_rescues_indefinite(self):
        # rank-deficient matrix: plain cholesky fails, ladder must succeed
        v = jnp.arange(6.0)
        A = jnp.outer(v, v)  # PSD rank-1, singular
        L = safe_cholesky(A)
        assert bool(jnp.all(jnp.isfinite(L)))
        recon = L @ L.T
        np.testing.assert_allclose(np.asarray(recon), np.asarray(A), atol=1e-4)

    def test_gradients_match_plain_cholesky(self):
        A0 = _psd(10, seed=3)

        def f_safe(x):
            M = jnp.asarray(A0) * x
            return jnp.sum(jnp.log(jnp.diagonal(safe_cholesky(M))))

        def f_plain(x):
            M = jnp.asarray(A0) * x
            return jnp.sum(jnp.log(jnp.diagonal(jnp.linalg.cholesky(M))))

        g_safe = jax.grad(f_safe)(1.7)
        g_plain = jax.grad(f_plain)(1.7)
        np.testing.assert_allclose(g_safe, g_plain, rtol=1e-9)

    def test_full_matrix_gradient(self):
        A = jnp.asarray(_psd(7, seed=5))

        def f_safe(M):
            L = safe_cholesky(M)
            return jnp.sum(L * jnp.cos(jnp.arange(49.0).reshape(7, 7)))

        def f_plain(M):
            L = jnp.linalg.cholesky(M)
            return jnp.sum(L * jnp.cos(jnp.arange(49.0).reshape(7, 7)))

        g_safe = jax.grad(f_safe)(A)
        g_plain = jax.grad(f_plain)(A)
        # plain grad is not symmetrized; compare symmetrized versions
        sym = lambda M: 0.5 * (M + M.T)
        np.testing.assert_allclose(np.asarray(sym(g_safe)), np.asarray(sym(g_plain)),
                                   rtol=1e-8, atol=1e-10)

    def test_under_jit(self):
        A = jnp.asarray(_psd(12, seed=1))
        L = jax.jit(safe_cholesky)(A)
        np.testing.assert_allclose(np.asarray(L), np.linalg.cholesky(np.asarray(A)),
                                   rtol=1e-10)

    def test_cho_solve_and_inverse_diag(self):
        A = jnp.asarray(_psd(9, seed=2))
        L = safe_cholesky(A)
        b = jnp.arange(9.0)
        x = cho_solve(L, b[:, None])[:, 0]
        np.testing.assert_allclose(np.asarray(A @ x), np.asarray(b), atol=1e-8)
        invd = chol_inverse_diag(L)
        np.testing.assert_allclose(np.asarray(invd),
                                   np.diag(np.linalg.inv(np.asarray(A))), rtol=1e-8)
        ld = logdet_from_chol(L)
        np.testing.assert_allclose(float(ld), np.linalg.slogdet(np.asarray(A))[1],
                                   rtol=1e-10)


class TestKron:
    def _setup(self, n=12, t=4, seed=0):
        rng = np.random.default_rng(seed)
        K = _psd(n, seed=seed + 1)
        B = _psd(t, seed=seed + 2)
        St = _psd(t, seed=seed + 3) + 0.5 * np.eye(t)
        Y = rng.standard_normal((n, t))
        return map(jnp.asarray, (K, B, St, Y))

    def test_icm_log_prob_matches_dense(self):
        K, B, St, Y = self._setup()
        n, t = Y.shape
        dense = np.kron(np.asarray(K), np.asarray(B)) + np.kron(np.eye(n), np.asarray(St))
        L = np.linalg.cholesky(dense)
        z = np.linalg.solve(L, np.asarray(Y).reshape(-1))
        expected = -0.5 * (z @ z + 2 * np.log(np.diag(L)).sum()
                           + n * t * np.log(2 * np.pi))
        got = kron_ops.icm_log_prob(K, B, St, Y, jitter=0.0)
        np.testing.assert_allclose(float(got), expected, rtol=1e-8)

    def test_icm_log_prob_chol_matches_eig(self):
        """The batched-Cholesky training variant == the joint-diagonalization
        value AND gradients (both exact; only the factorization differs)."""
        K, B, St, Y = self._setup(seed=3)
        v_eig = float(kron_ops.icm_log_prob(K, B, St, Y, jitter=0.0))
        v_chol = float(kron_ops.icm_log_prob_chol(K, B, St, Y, jitter=0.0))
        np.testing.assert_allclose(v_chol, v_eig, rtol=1e-10)
        g_eig = jax.grad(lambda *a: kron_ops.icm_log_prob(*a, jitter=0.0),
                         argnums=(0, 1, 2, 3))(K, B, St, Y)
        g_chol = jax.grad(lambda *a: kron_ops.icm_log_prob_chol(*a, jitter=0.0),
                          argnums=(0, 1, 2, 3))(K, B, St, Y)
        for a, b, name in zip(g_chol, g_eig, ("dK", "dB", "dSt", "dY")):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       rtol=1e-7, atol=1e-10, err_msg=name)

    def test_icm_chol_grads_clustered_spectrum(self):
        """Regression for the round-3 cross-model-consistency diagnosis:
        with a rank-t noise factor Σt = GGᵀ + σI (the reference's
        q_noise_guess = p default), the whitened B̃ has a CLUSTER of
        near-equal eigenvalues; autodiff through eigh(B̃) then amplifies
        rounding by 1/(γ_i − γ_j) into O(1) gradient noise. The analytic
        custom VJP must match a dense fp64 Cholesky-autodiff oracle (which
        never eigendecomposes anything) on exactly this spectrum."""
        rng = np.random.default_rng(11)
        n, t, q = 40, 24, 6
        X = np.linspace(-1, 1, n)[:, None]
        d2 = (X - X.T) ** 2 / 0.3 ** 2
        K = jnp.asarray((1 + np.sqrt(5 * d2)
                         + 5 * d2 / 3) * np.exp(-np.sqrt(5 * d2)))
        F = rng.standard_normal((t, q))
        B = jnp.asarray(F @ F.T + np.diag(np.log1p(np.exp(
            rng.standard_normal(t)))))
        G = rng.standard_normal((t, t))
        St = jnp.asarray(G @ G.T + 0.7 * np.eye(t))
        Y = jnp.asarray(rng.standard_normal((n, t)))

        def dense_ll(K, B, St, Y):
            dense = (jnp.kron(K, B)
                     + jnp.kron(jnp.eye(n, dtype=K.dtype), St))
            L = jnp.linalg.cholesky(dense)
            z = jax.scipy.linalg.solve_triangular(L, Y.reshape(-1),
                                                  lower=True)
            return -0.5 * (z @ z
                           + 2 * jnp.sum(jnp.log(jnp.diagonal(L)))
                           + n * t * jnp.log(2 * jnp.pi))

        g_ref = jax.grad(dense_ll, argnums=(0, 1, 2, 3))(K, B, St, Y)
        g_new = jax.grad(lambda *a: kron_ops.icm_log_prob_chol(*a, jitter=0.0),
                         argnums=(0, 1, 2, 3))(K, B, St, Y)
        for a, b, name in zip(g_new, g_ref, ("dK", "dB", "dSt", "dY")):
            scale = float(np.abs(np.asarray(b)).max()) + 1e-30
            err = float(np.abs(np.asarray(a) - np.asarray(b)).max()) / scale
            assert err < 1e-8, (name, err)

    def test_icm_log_prob_chol_low_rank_B(self):
        """B = ffᵀ + tiny diag (rank-1 ICM with fix_diagonal): γ_j ≈ 0
        eigenvalues must stay PSD-safe."""
        K, _, St, Y = self._setup(seed=4)
        t = Y.shape[1]
        rng = np.random.default_rng(5)
        f = rng.standard_normal((t, 1))
        B = jnp.asarray(f @ f.T + 4.5e-5 * np.eye(t))
        v_eig = float(kron_ops.icm_log_prob(K, B, St, Y, jitter=0.0))
        v_chol = float(kron_ops.icm_log_prob_chol(K, B, St, Y, jitter=0.0))
        np.testing.assert_allclose(v_chol, v_eig, rtol=1e-9)

    def test_icm_solve_matches_dense(self):
        K, B, St, Y = self._setup(seed=7)
        n, t = Y.shape
        dense = np.kron(np.asarray(K), np.asarray(B)) + np.kron(np.eye(n), np.asarray(St))
        expected = np.linalg.solve(dense, np.asarray(Y).reshape(-1)).reshape(n, t)
        fac = kron_ops.icm_eig_factors(K, B, St, jitter=0.0)
        got = kron_ops.icm_solve(Y, fac)
        np.testing.assert_allclose(np.asarray(got), expected, rtol=1e-5, atol=1e-8)

    def test_icm_posterior_variance_matches_dense(self):
        K, B, St, Y = self._setup(seed=9)
        n, t = Y.shape
        rng = np.random.default_rng(11)
        # treat the first 8 points as "training", 4 fresh points as test
        Kfull = _psd(16, seed=20)
        Ktr = jnp.asarray(Kfull[:n, :n])
        fac = kron_ops.icm_eig_factors(Ktr, B, St, jitter=0.0)
        Kstar_train = jnp.asarray(Kfull[n:, :n][:3])
        Kstar_diag = jnp.asarray(np.diag(Kfull)[n:n + 3])
        got = kron_ops.icm_posterior_variance(Kstar_diag, Kstar_train, B, fac,
                                              noise_diag=jnp.diagonal(St))
        dense = np.kron(np.asarray(Ktr), np.asarray(B)) + np.kron(np.eye(n), np.asarray(St))
        cross = np.kron(np.asarray(Kstar_train), np.asarray(B))
        prior_diag = (np.outer(np.asarray(Kstar_diag), np.diag(np.asarray(B)))
                      + np.diag(np.asarray(St))[None, :])
        corr = cross @ np.linalg.solve(dense, cross.T)
        expected = prior_diag - np.diag(corr).reshape(3, t)
        np.testing.assert_allclose(np.asarray(got), np.clip(expected, 1e-6, None),
                                   rtol=1e-6, atol=1e-8)


class TestWoodburyLMC:
    def _setup(self, n=10, t=5, q=3, seed=0):
        rng = np.random.default_rng(seed)
        Ks = np.stack([_psd(n, seed=seed + i) for i in range(q)])
        H = rng.standard_normal((t, q))
        St = _psd(t, seed=seed + 50) + 0.4 * np.eye(t)
        Y = rng.standard_normal((n, t))
        return map(jnp.asarray, (Ks, H, St, Y))

    def _dense(self, Ks, H, St):
        Ks, H, St = map(np.asarray, (Ks, H, St))
        q, n, _ = Ks.shape
        t = H.shape[0]
        out = np.kron(np.eye(n), St)
        for b in range(q):
            out += np.kron(Ks[b], np.outer(H[:, b], H[:, b]))
        return out

    def test_log_prob_matches_dense(self):
        Ks, H, St, Y = self._setup()
        dense = self._dense(Ks, H, St)
        n, t = Y.shape
        L = np.linalg.cholesky(dense)
        z = np.linalg.solve(L, np.asarray(Y).reshape(-1))
        expected = -0.5 * (z @ z + 2 * np.log(np.diag(L)).sum()
                           + n * t * np.log(2 * np.pi))
        got = wb_ops.lmc_log_prob(Ks, H, St, Y, jitter=0.0)
        np.testing.assert_allclose(float(got), expected, rtol=1e-8)

    def test_solve_matches_dense(self):
        Ks, H, St, Y = self._setup(seed=4)
        dense = self._dense(Ks, H, St)
        n, t = Y.shape
        fac = wb_ops.lmc_factors(Ks, H, St, jitter=0.0)
        got = wb_ops.lmc_solve(Y, fac)
        expected = np.linalg.solve(dense, np.asarray(Y).reshape(-1)).reshape(n, t)
        np.testing.assert_allclose(np.asarray(got), expected, rtol=1e-7, atol=1e-9)

    def test_posterior_mean_variance_match_dense(self):
        n, t, q, ns = 10, 4, 3, 6
        rng = np.random.default_rng(42)
        Kf = np.stack([_psd(n + ns, seed=60 + i) for i in range(q)])
        Ks = jnp.asarray(Kf[:, :n, :n])
        Kstars = jnp.asarray(Kf[:, n:, :n])
        Kstar_diag = jnp.asarray(np.stack([np.diag(Kf[b])[n:] for b in range(q)]))
        H = jnp.asarray(rng.standard_normal((t, q)))
        St = jnp.asarray(_psd(t, seed=77) + 0.4 * np.eye(t))
        Y = jnp.asarray(rng.standard_normal((n, t)))

        fac = wb_ops.lmc_factors(Ks, H, St, jitter=0.0)
        alpha = wb_ops.lmc_solve(Y, fac)
        mean = wb_ops.lmc_posterior_mean(Kstars, H, alpha, 0.0)
        var = wb_ops.lmc_posterior_variance(Kstars, Kstar_diag, H, St, fac, noise=True)

        dense = self._dense(Ks, H, St)
        cross = sum(np.kron(np.asarray(Kstars)[b], np.outer(np.asarray(H)[:, b],
                                                            np.asarray(H)[:, b]))
                    for b in range(q))
        sol = np.linalg.solve(dense, np.asarray(Y).reshape(-1))
        exp_mean = (cross @ sol).reshape(ns, t)
        prior_diag = (np.asarray(Kstar_diag).T @ (np.asarray(H) ** 2).T
                      + np.diag(np.asarray(St))[None, :])
        corr = cross @ np.linalg.solve(dense, cross.T)
        exp_var = prior_diag - np.diag(corr).reshape(ns, t)
        np.testing.assert_allclose(np.asarray(mean), exp_mean, rtol=1e-7, atol=1e-9)
        np.testing.assert_allclose(np.asarray(var), np.clip(exp_var, 1e-6, None),
                                   rtol=1e-6, atol=1e-8)

    def test_chunked_variance(self):
        Ks, H, St, Y = self._setup(n=9, t=3, q=2, seed=8)
        q, n, _ = Ks.shape
        Kstars = Ks[:, :, :]  # reuse train as "test" cross-covs
        Kdiag = jnp.diagonal(Ks, axis1=-2, axis2=-1)
        fac = wb_ops.lmc_factors(Ks, H, St, jitter=0.0)
        v1 = wb_ops.lmc_posterior_variance(Kstars, Kdiag, H, St, fac, chunk=4)
        v2 = wb_ops.lmc_posterior_variance(Kstars, Kdiag, H, St, fac, chunk=512)
        np.testing.assert_allclose(np.asarray(v1), np.asarray(v2), rtol=1e-9)


class TestBlockedCholesky:
    """ops/blocked_cholesky.py: fp32 blocking is exact; bf16 trailing updates
    stay within the documented operator-noise class."""

    def _spd(self, n, seed=0, batch=None, dtype=np.float32):
        rng = np.random.default_rng(seed)
        shape = (n, 256) if batch is None else (batch, n, 256)
        A = rng.standard_normal(shape).astype(dtype)
        K = A @ np.swapaxes(A, -1, -2) / 256
        eye = np.eye(n, dtype=dtype)
        return jnp.asarray(K + 1e-2 * eye)

    def test_f32_blocked_matches_stock(self):
        from projected_lmc_tpu.ops.blocked_cholesky import cholesky_blocked_f32
        K = self._spd(300)
        L = cholesky_blocked_f32(K, block=128)
        L_ref = jnp.linalg.cholesky(K)
        np.testing.assert_allclose(np.asarray(L), np.asarray(L_ref),
                                   rtol=1e-4, atol=1e-5)

    def test_bf16_blocked_reconstructs(self):
        from projected_lmc_tpu.ops.blocked_cholesky import cholesky_bf16_blocked
        K = self._spd(300)
        L = jax.jit(lambda a: cholesky_bf16_blocked(a, block=128))(K)
        L = np.tril(np.asarray(L, np.float64))
        recon = L @ L.T
        Kn = np.asarray(K, np.float64)
        rel = np.abs(recon - Kn).max() / np.abs(Kn).max()
        assert np.isfinite(L).all()
        assert rel < 2e-2, rel        # bf16 trailing-update noise class

    def test_bf16_blocked_batched_and_ragged(self):
        from projected_lmc_tpu.ops.blocked_cholesky import cholesky_bf16_blocked
        K = self._spd(200, batch=3)    # 200 does not divide block=128
        L = cholesky_bf16_blocked(K, block=128)
        assert L.shape == K.shape
        for b in range(3):
            Lb = np.tril(np.asarray(L[b], np.float64))
            Kn = np.asarray(K[b], np.float64)
            rel = np.abs(Lb @ Lb.T - Kn).max() / np.abs(Kn).max()
            assert rel < 2e-2, (b, rel)

    def test_small_n_falls_back(self):
        from projected_lmc_tpu.ops.blocked_cholesky import cholesky_bf16_blocked
        K = self._spd(64)
        np.testing.assert_allclose(np.asarray(cholesky_bf16_blocked(K)),
                                   np.asarray(jnp.linalg.cholesky(K)),
                                   atol=0.0)

    def test_bf16_blocked_survives_gp_spectrum(self):
        """Low-rank-dominant + tiny ridge (K = HHᵀ + σ²I, σ² ≪ ‖K‖): the
        case where bare bf16 trailing updates drive Schur diagonals negative
        and NaN (observed at n=8192 on TPU). The exact-fp32-update-diagonal +
        jitter-ladder countermeasures must keep the factor finite with
        reconstruction error in the bf16 operator-noise class."""
        from projected_lmc_tpu.ops.blocked_cholesky import cholesky_bf16_blocked
        rng = np.random.default_rng(3)
        n, r = 1024, 32
        A = rng.standard_normal((n, r)).astype(np.float32)
        K = jnp.asarray(A @ A.T / r + 1e-4 * np.eye(n, dtype=np.float32))
        L = jax.jit(lambda a: cholesky_bf16_blocked(a, block=128))(K)
        L = np.tril(np.asarray(L, np.float64))
        assert np.isfinite(L).all()
        Kn = np.asarray(K, np.float64)
        rel = np.abs(L @ L.T - Kn).max() / np.abs(Kn).max()
        # ~4e-3 bf16 noise accumulated over 7 trailing panels on a
        # condition-3e5 matrix; the guarantee here is finite + bounded,
        # not tight — tight factorizations use the f32 path
        assert rel < 6e-2, rel

    def test_icm_mll_chol_bf16_close(self):
        """ICM training MLL with the bf16 blocked factorization stays within
        training-tolerance distance of the fp32 value."""
        from projected_lmc_tpu.ops import kron as kron_ops
        rng = np.random.default_rng(1)
        n, t = 160, 3
        X = rng.uniform(-1, 1, (n, 2))
        K = jnp.asarray(np.exp(-((X[:, None] - X[None]) ** 2).sum(-1)),
                        jnp.float32)
        F = rng.standard_normal((t, 2)).astype(np.float32)
        B = jnp.asarray(F @ F.T + 0.1 * np.eye(t), jnp.float32)
        St = jnp.asarray(0.3 * np.eye(t), jnp.float32)
        Y = jnp.asarray(rng.standard_normal((n, t)), jnp.float32)
        v32 = float(kron_ops.icm_log_prob_chol(K, B, St, Y))
        v16 = float(kron_ops.icm_log_prob_chol(K, B, St, Y, chol_bf16=True,
                                               chol_block=64))
        assert abs(v16 - v32) / abs(v32) < 1e-2, (v16, v32)


if __name__ == "__main__":
    pytest.main([__file__, "-x", "-q"])
