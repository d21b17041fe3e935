"""MLL-layer tests — including the flagship identity: the projected-LMC MLL
decomposition equals the exact dense multitask log-likelihood of the implied
full model, log N(vec Y; 0, Σ_b K_b ⊗ h_b h_bᵀ + I ⊗ Σ_task)/n
(the paper's Proposition; reference computes it at projected_lmc.py:1178-1241)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

import projected_lmc_tpu as pl
from projected_lmc_tpu.mlls import projected_lmc_mll, loo_pseudo_likelihood


def make_data(n=25, p=5, q=2, seed=0):
    rng = np.random.default_rng(seed)
    X = np.linspace(-1, 1, n)[:, None]
    U = np.stack([np.sin(3 * X[:, 0]), np.cos(5 * X[:, 0])][:q], axis=1)
    H = rng.standard_normal((q, p))
    Y = U @ H + 0.05 * rng.standard_normal((n, p))
    return X, Y


def dense_full_model_logprob(model, Y):
    """log N(vec(Y); 0, Σ_b K_b ⊗ h_b h_bᵀ + I_n ⊗ Σ)/n, Σ from full_likelihood
    (built without the jitter the packaged full_likelihood adds)."""
    n, p = Y.shape
    Ks = np.asarray(model.covar_module(model.train_x))      # (q, n, n)
    H = np.asarray(model.lmc_coefficients())                # (q, p)
    # reconstruct Sigma exactly (no jitter): same algebra as full_likelihood
    Q, R, Q_orth = [None if t is None else np.asarray(t)
                    for t in model.lmc_coefficients.QR()]
    QR = Q @ R
    sigma_p = np.asarray(model.projected_noise())
    if not model.BDN:
        B_tilde = np.asarray(model.B_tilde())
        M = np.asarray(model.M)
        B_term = Q_orth @ B_tilde @ Q_orth.T
        M_term = -QR @ (sigma_p[:, None] * M) @ B_tilde @ Q_orth.T
        D_rot = np.diag(sigma_p) + (sigma_p[:, None] * M) @ B_tilde @ (M.T * sigma_p[None, :])
        Sigma = QR @ D_rot @ QR.T + M_term + M_term.T + B_term
    else:
        if model.scalar_B and model.log_B_tilde_raw.size > 0:
            B_term = np.exp(float(model.log_B_tilde[0])) * (np.eye(p) - Q @ Q.T)
        else:
            B_term = Q_orth @ np.asarray(model.B_tilde()) @ Q_orth.T
        D_root = QR * np.sqrt(sigma_p)[None, :]
        Sigma = D_root @ D_root.T + B_term

    cov = np.kron(np.eye(n), Sigma)
    for b in range(Ks.shape[0]):
        cov += np.kron(Ks[b], np.outer(H[b], H[b]))
    L = np.linalg.cholesky(cov)
    z = np.linalg.solve(L, Y.reshape(-1))
    logp = -0.5 * (z @ z + 2 * np.log(np.diag(L)).sum()
                   + n * p * np.log(2 * np.pi))
    return logp / n


class TestProjectedMLLIdentity:
    @pytest.mark.parametrize("cfg", [
        dict(BDN=False, diagonal_B=False, scalar_B=False, diagonal_R=False),
        dict(BDN=True, diagonal_B=True, scalar_B=False, diagonal_R=False),
        dict(BDN=True, diagonal_B=True, scalar_B=True, diagonal_R=False),
        dict(BDN=True, diagonal_B=True, scalar_B=True, diagonal_R=True, bulk=False),
    ])
    def test_equals_dense_full_model(self, cfg):
        X, Y = make_data()
        m = pl.ProjectedGPModel(X, Y, Y.shape[1], 2, init_lmc_coeffs=True,
                                kernel_type="matern", **cfg)
        got = float(projected_lmc_mll(m))
        expected = dense_full_model_logprob(m, Y)
        np.testing.assert_allclose(got, expected, rtol=1e-8)

    def test_equals_dense_with_nonzero_M(self):
        """The M cross-coupling (non-BDN) keeps the identity exact."""
        X, Y = make_data(seed=3)
        m = pl.ProjectedGPModel(X, Y, Y.shape[1], 2, init_lmc_coeffs=True,
                                BDN=False, diagonal_B=False, scalar_B=False)
        rng = np.random.default_rng(7)
        m = m.replace(M=jnp.asarray(0.3 * rng.standard_normal(m.M.shape)))
        got = float(projected_lmc_mll(m))
        expected = dense_full_model_logprob(m, Y)
        np.testing.assert_allclose(got, expected, rtol=1e-8)

    def test_scalar_fast_path_matches_slow_path(self):
        """PLMC_fast's cached ‖Y‖²−‖YQ‖² identity (projected_lmc.py:1215)."""
        X, Y = make_data(seed=5)
        m = pl.ProjectedGPModel(X, Y, Y.shape[1], 2, init_lmc_coeffs=True,
                                BDN=True, diagonal_B=True, scalar_B=True)
        got, terms = projected_lmc_mll(m, with_terms=True)
        # manual slow computation of the discarded-data misfit
        Q, R, _ = m.lmc_coefficients.QR()
        Ynp = np.asarray(Y)
        resid = Ynp - Ynp @ np.asarray(Q) @ np.asarray(Q).T
        manual = -0.5 * np.exp(-float(m.log_B_tilde[0])) * (resid**2).sum() / Y.shape[0]
        np.testing.assert_allclose(float(terms[1]), manual, rtol=1e-7)

    def test_gradients_flow(self):
        X, Y = make_data()
        m = pl.ProjectedGPModel(X, Y, Y.shape[1], 2, init_lmc_coeffs=True,
                                BDN=False, diagonal_B=False, scalar_B=False)
        from projected_lmc_tpu.module import trainable_mask, partition, combine
        mask = trainable_mask(m)
        params, static = partition(m, mask)
        g = jax.grad(lambda p: -projected_lmc_mll(combine(p, static)))(params)
        leaves = jax.tree_util.tree_leaves(g)
        assert all(bool(jnp.all(jnp.isfinite(l))) for l in leaves)
        assert any(float(jnp.max(jnp.abs(l))) > 0 for l in leaves)


class TestLOO:
    def test_loo_matches_brute_force(self):
        """σᵢ² = 1/[K⁻¹]ᵢᵢ identity vs actually leaving each point out."""
        rng = np.random.default_rng(0)
        n = 12
        X = np.sort(rng.random(n))[:, None]
        y = np.sin(4 * X[:, 0]) + 0.01 * rng.standard_normal(n)
        lik = pl.GaussianLikelihood(batch_shape=1, noise_init=0.05)
        m = pl.ExactGPModel(X, y, lik, n_tasks=1, kernel_type="rbf",
                            mean_type="zero")
        sigma2, yminusmu = m.compute_loo()
        ls = float(m.covar_module.lengthscale[0, 0, 0])

        def kmat(a, b):
            return np.exp(-0.5 * (a - b.T) ** 2 / ls**2)

        for i in range(n):
            keep = np.arange(n) != i
            Ktr = kmat(X[keep], X[keep]) + 0.05 * np.eye(n - 1)
            ks = kmat(X[i:i + 1], X[keep])
            mu_i = float(ks @ np.linalg.solve(Ktr, y[keep]))
            var_i = float(kmat(X[i:i+1], X[i:i+1]) + 0.05
                          - ks @ np.linalg.solve(Ktr, ks.T))
            np.testing.assert_allclose(float(sigma2[i, 0]), var_i, rtol=1e-6)
            np.testing.assert_allclose(float(yminusmu[i, 0]), y[i] - mu_i,
                                       rtol=1e-5, atol=1e-10)

    def test_loo_pseudo_likelihood_scalar(self):
        X, Y = make_data(n=20, p=1, q=1)
        lik = pl.GaussianLikelihood(batch_shape=1)
        m = pl.ExactGPModel(X, Y[:, 0], lik, n_tasks=1)
        val = loo_pseudo_likelihood(m)
        assert np.isfinite(float(val))


if __name__ == "__main__":
    pytest.main([__file__, "-x", "-q"])
