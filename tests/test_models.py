"""Model-level tests: the driver's 5 graded configs at small scale, plus
closed-form posterior checks and cross-model consistency (SURVEY §4)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

import projected_lmc_tpu as pl
from projected_lmc_tpu.training import fit


def make_data(n=80, p=6, q=2, noise=0.05, seed=0, dtype=np.float64):
    rng = np.random.default_rng(seed)
    X = np.linspace(-1, 1, n)[:, None].astype(dtype)
    U = np.stack([np.sin(3 * X[:, 0]), np.cos(5 * X[:, 0]),
                  np.sin(7 * X[:, 0])][:q], axis=1)
    H = rng.standard_normal((q, p))
    Y = (U @ H + noise * rng.standard_normal((n, p))).astype(dtype)
    return X, Y, U @ H, H


class TestExactGP:
    def test_closed_form_posterior(self):
        """n=4 closed-form GP regression check against hand-rolled numpy."""
        X = np.array([[-1.0], [-0.3], [0.4], [0.9]])
        y = np.array([0.1, -0.4, 0.3, 0.8])
        noise = 0.01
        lik = pl.GaussianLikelihood(batch_shape=1, noise_init=noise)
        m = pl.ExactGPModel(X, y, lik, n_tasks=1, kernel_type="rbf", mean_type="zero")
        ls = float(m.covar_module.lengthscale[0, 0, 0])

        def k(a, b):
            return np.exp(-0.5 * (a - b.T) ** 2 / ls**2)

        K = k(X, X) + noise * np.eye(4)
        Xs = np.array([[0.0], [0.5]])
        Ks = k(Xs, X)
        expected_mean = Ks @ np.linalg.solve(K, y)
        expected_var = np.diag(k(Xs, Xs) - Ks @ np.linalg.solve(K, Ks.T))

        post = m.posterior(Xs, full_cov=False)
        np.testing.assert_allclose(np.asarray(post.mean)[0], expected_mean, rtol=1e-6)
        np.testing.assert_allclose(np.asarray(post.variance)[0], expected_var,
                                   rtol=1e-5, atol=1e-10)

    def test_mll_matches_gaussian_logpdf(self):
        X = np.array([[-1.0], [0.0], [1.0]])
        y = np.array([0.2, -0.1, 0.5])
        noise = 0.1
        lik = pl.GaussianLikelihood(batch_shape=1, noise_init=noise)
        m = pl.ExactGPModel(X, y, lik, n_tasks=1, kernel_type="rbf", mean_type="zero")
        ls = float(m.covar_module.lengthscale[0, 0, 0])
        K = np.exp(-0.5 * (X - X.T) ** 2 / ls**2) + noise * np.eye(3)
        from scipy.stats import multivariate_normal
        expected = multivariate_normal.logpdf(y, mean=np.zeros(3), cov=K) / 3
        np.testing.assert_allclose(float(m.mll()), expected, rtol=1e-6)

    def test_training_reduces_loss_config1(self):
        """Driver config 1: exact single-output GP, RBF, synthetic points."""
        X, Y, F, _ = make_data(n=60, p=1, q=1)
        lik = pl.GaussianLikelihood(batch_shape=1)
        m = pl.ExactGPModel(X, Y[:, 0], lik, n_tasks=1, kernel_type="rbf")
        l0 = float(m.mll())
        m2, info = fit(m, n_iter=150, lr=0.05, patience=40)
        assert -info["loss"] > l0
        post = m2.posterior(X, full_cov=False)
        assert np.sqrt(np.mean((np.asarray(post.mean)[0] - F[:, 0]) ** 2)) < 0.1

    def test_batch_multitask_config2(self):
        """Driver config 2: batch-independent multitask GP."""
        X, Y, F, _ = make_data(n=60, p=3, q=2)
        lik = pl.GaussianLikelihood(batch_shape=3)
        m = pl.ExactGPModel(X, Y, lik, n_tasks=3, kernel_type="matern")
        m2, info = fit(m, n_iter=200, lr=0.05, patience=40)
        post = m2.posterior(X, full_cov=False)
        rmse = np.sqrt(np.mean((np.asarray(post.mean).T - F) ** 2))
        assert rmse < 0.1
        # introspection
        assert np.asarray(m2.lscales()).shape[-1] == 1 or np.asarray(m2.lscales()).ndim >= 0
        s2, ym = m2.compute_loo()
        assert s2.shape == (60, 3) and bool(jnp.all(s2 > 0))

    def test_batch_exact_iterative_mll_matches_dense(self):
        """Matrix-free batched-exact MLL (the T·n² > ITER_TN2_MAX route —
        the regime gpytorch reaches via eager CG while the dense batched
        Cholesky stack no longer fits HBM): with tight CG it equals the
        dense per-task value, and gradients agree."""
        X, Y, _, _ = make_data(n=70, p=3, q=2)
        lik = pl.GaussianLikelihood(batch_shape=3)
        m = pl.ExactGPModel(X, Y, lik, n_tasks=3, kernel_type="matern")
        v_dense = float(m.mll())
        v_iter = float(m.mll(iterative=True, key=jax.random.PRNGKey(0),
                             num_probes=30, max_cg_iters=400, cg_tol=1e-10,
                             precond_rank=24))
        assert abs(v_iter - v_dense) / abs(v_dense) < 2e-2
        # gradient direction agrees on the lengthscale
        def gd(iterative):
            def f(ls):
                mm = m.replace(covar_module=m.covar_module.replace(
                    raw_lengthscale=ls))
                return mm.mll(iterative=iterative,
                              key=jax.random.PRNGKey(1), num_probes=30,
                              max_cg_iters=400, cg_tol=1e-10,
                              precond_rank=24)
            return np.asarray(jax.grad(f)(m.covar_module.raw_lengthscale))
        g0, g1 = gd(False), gd(True)
        cos = float((g0 * g1).sum()
                    / (np.linalg.norm(g0) * np.linalg.norm(g1) + 1e-30))
        assert cos > 0.99, cos

    def test_sgpr_iterative_request_raises(self):
        """iterative=True on an SGPR model must fail loudly — the Titsias
        bound would silently drop every CG kwarg otherwise."""
        X, Y, _, _ = make_data(n=40, p=1, q=1)
        lik = pl.GaussianLikelihood(batch_shape=1)
        m = pl.ExactGPModel(X, Y[:, 0], lik, n_tasks=1, n_inducing_points=10)
        with pytest.raises(ValueError, match="SGPR"):
            m.mll(iterative=True)
        # the auto-route (iterative=None) still lands on the Titsias bound
        assert np.isfinite(float(m.mll()))

    def test_auto_iterative_warns_and_default_rank(self, monkeypatch):
        """Crossing ITER_TN2_MAX silently changed mll() semantics (exact ->
        stochastic estimator); it must now warn. precond_rank<=0 selects the
        default Nyström rank (same convention as the ICM iterative route)."""
        X, Y, _, _ = make_data(n=48, p=2, q=2)
        lik = pl.GaussianLikelihood(batch_shape=2)
        m = pl.ExactGPModel(X, Y, lik, n_tasks=2, kernel_type="matern")
        v_dense = float(m.mll())
        monkeypatch.setattr(pl.ExactGPModel, "ITER_TN2_MAX", 10)
        with pytest.warns(UserWarning, match="auto-routing"):
            v_auto = float(m.mll(key=jax.random.PRNGKey(2), num_probes=30,
                                 max_cg_iters=400, cg_tol=1e-10))
        assert abs(v_auto - v_dense) / abs(v_dense) < 5e-2
        # explicit iterative=True does not warn; rank 0 -> default rank
        v0 = float(m.mll(iterative=True, key=jax.random.PRNGKey(2),
                         num_probes=30, max_cg_iters=400, cg_tol=1e-10,
                         precond_rank=0))
        np.testing.assert_allclose(v0, v_auto, rtol=1e-6)

    def test_sgpr_inducing(self):
        X, Y, F, _ = make_data(n=120, p=1, q=1)
        lik = pl.GaussianLikelihood(batch_shape=1)
        m = pl.ExactGPModel(X, Y[:, 0], lik, n_tasks=1, n_inducing_points=20)
        # inducing points must be trainable, model must train
        m2, info = fit(m, n_iter=250, lr=0.05, patience=60)
        post = m2.posterior(X, full_cov=False)
        rmse = np.sqrt(np.mean((np.asarray(post.mean)[0] - F[:, 0]) ** 2))
        assert rmse < 0.15
        assert not np.allclose(np.asarray(m2.inducing_points),
                               np.asarray(m.inducing_points))


class TestComplexMeanLOO:
    def test_complex_mean_loo_matches_brute_force(self):
        """Universal-kriging LOO (projected_lmc.py:417-430): the corrected
        precision K⁻ = K⁻¹ − K⁻¹B(BᵀK⁻¹B)⁻¹BᵀK⁻¹ gives σᵢ² = 1/[K⁻]ᵢᵢ and
        residuals [K⁻ y]ᵢ σᵢ² — check against the dense formula directly."""
        X, Y, _, _ = make_data(n=30, p=1, q=1)
        lik = pl.GaussianLikelihood(batch_shape=1, noise_init=0.05)
        m = pl.ExactGPModel(X, Y[:, 0], lik, n_tasks=1, kernel_type="rbf",
                            mean_type="linear")
        sigma2, resid = m.compute_loo(complex_mean=True)
        assert sigma2.shape == (30, 1) and bool(jnp.all(sigma2 > 0))
        K = np.asarray(m.covar_module(m.train_x))[0] + 0.05 * np.eye(30)
        B = np.asarray(m.mean_module.basis_matrix(m.train_x))
        Kinv = np.linalg.inv(K)
        corr = Kinv @ B @ np.linalg.inv(B.T @ Kinv @ B + 1e-6 * np.eye(B.shape[1])) @ B.T @ Kinv
        Kminus = Kinv - corr
        exp_sig2 = 1.0 / np.diag(Kminus)
        exp_resid = (Kminus @ np.asarray(m.train_y)[0]) * exp_sig2
        np.testing.assert_allclose(np.asarray(sigma2)[:, 0], exp_sig2, rtol=1e-5)
        np.testing.assert_allclose(np.asarray(resid)[:, 0], exp_resid,
                                   rtol=1e-4, atol=1e-8)

    def test_complex_mean_requires_basis(self):
        X, Y, _, _ = make_data(n=20, p=1, q=1)
        lik = pl.GaussianLikelihood(batch_shape=1)
        m = pl.ExactGPModel(X, Y[:, 0], lik, n_tasks=1, mean_type="constant")
        with pytest.raises(ValueError):
            m.compute_loo(complex_mean=True)


class TestMultitask:
    def test_icm_mll_matches_dense(self):
        """ICM Kronecker MLL == dense multitask MVN log-prob."""
        X, Y, _, _ = make_data(n=20, p=3, q=2)
        lik = pl.MultitaskGaussianLikelihood(num_tasks=3, rank=2)
        m = pl.MultitaskGPModel(X, Y, lik, n_tasks=3, n_latents=2, model_type="ICM")
        got = float(m.mll()) * (20 * 3)
        dist = m(X)
        dist = pl.MultitaskMultivariateNormal(
            dist.mean, dist.covar.with_noise(lik.task_covariance()))
        dense = dist.to_dense()
        expected = float(dense.log_prob(jnp.asarray(Y).reshape(-1)))
        np.testing.assert_allclose(got, expected, rtol=1e-6)

    def test_lmc_mll_matches_dense(self):
        X, Y, _, _ = make_data(n=15, p=4, q=2)
        lik = pl.MultitaskGaussianLikelihood(num_tasks=4, rank=0)
        m = pl.MultitaskGPModel(X, Y, lik, n_tasks=4, n_latents=2,
                                model_type="LMC", fix_diagonal=False)
        got = float(m.mll()) * (15 * 4)
        mean = m.mean_module(X).T
        cov = pl.SumKronRank1Cov(
            m.covar_module(X), jnp.asarray(m.lmc_coefficients()).T,
            lik.task_covariance() + jnp.diag(m._lmc_extra_diag()))
        dist = pl.MultitaskMultivariateNormal(mean, cov)
        expected = float(dist.to_dense().log_prob(jnp.asarray(Y).reshape(-1)))
        np.testing.assert_allclose(got, expected, rtol=1e-6)

    def test_icm_rank_noise_gradients_match_dense(self):
        """rank-q task_noise_covar_factor TRAINING path: gradients of the
        Kronecker MLL w.r.t. the noise factor (and the global noise) match
        autodiff through the brute-force dense log-prob."""
        X, Y, _, _ = make_data(n=18, p=3, q=2)
        lik = pl.MultitaskGaussianLikelihood(num_tasks=3, rank=2)
        m = pl.MultitaskGPModel(X, Y, lik, n_tasks=3, n_latents=2,
                                model_type="ICM")
        yvec = jnp.asarray(Y).reshape(-1)
        K = m.covar_module(X)[0]
        B = m.task_covar_matrix()
        mean = m.mean_module(X).T.reshape(-1)

        def dense_ll(F, raw_noise):
            lk = lik.replace(task_noise_covar_factor=F, raw_noise=raw_noise)
            St = lk.task_covariance()
            n = K.shape[0]
            cov = jnp.kron(K, B) + jnp.kron(jnp.eye(n, dtype=K.dtype), St)
            L = jnp.linalg.cholesky(cov)
            z = jax.scipy.linalg.solve_triangular(L, yvec - mean, lower=True)
            return (-0.5 * (jnp.sum(z * z)
                            + 2 * jnp.sum(jnp.log(jnp.diagonal(L)))
                            + yvec.size * np.log(2 * np.pi))
                    + m.covar_module.prior_log_prob()) / yvec.size

        def model_ll(F, raw_noise):
            lk = lik.replace(task_noise_covar_factor=F, raw_noise=raw_noise)
            return m.replace(likelihood=lk).mll()

        args = (lik.task_noise_covar_factor, lik.raw_noise)
        gd = jax.grad(dense_ll, argnums=(0, 1))(*args)
        gm = jax.grad(model_ll, argnums=(0, 1))(*args)
        for a, b, name in zip(gm, gd, ("dF", "dnoise")):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       rtol=1e-6, atol=1e-10, err_msg=name)

    def test_icm_rank_noise_trains(self):
        """fit() updates the rank-q noise factor and improves the loss —
        the configuration the reference's default synthetic sweep trains
        (experiments.py:181-185, lik_rank=q_noise_guess)."""
        X, Y, _, _ = make_data(n=40, p=4, q=2, noise=0.2)
        lik = pl.MultitaskGaussianLikelihood(num_tasks=4, rank=4)
        m = pl.MultitaskGPModel(X, Y, lik, n_tasks=4, n_latents=2,
                                model_type="ICM")
        trained, info = fit(m, n_iter=30, lr=5e-2, scan_steps=1)
        assert info["losses"][-1] < info["losses"][0]
        dF = np.abs(np.asarray(trained.likelihood.task_noise_covar_factor)
                    - np.asarray(m.likelihood.task_noise_covar_factor)).max()
        assert dF > 1e-4, "noise factor did not receive updates"

    def test_kernel_cond(self):
        """MultitaskGPModel.kernel_cond (projected_lmc.py:367-369 inherited)
        == numpy cond of the explicitly assembled dense covariance."""
        X, Y, _, _ = make_data(n=12, p=3, q=2)
        lik = pl.MultitaskGaussianLikelihood(num_tasks=3, rank=0)
        m = pl.MultitaskGPModel(X, Y, lik, n_tasks=3, n_latents=2,
                                model_type="ICM")
        got = float(m.kernel_cond())
        K = np.asarray(m.covar_module(X)[0])
        B = np.asarray(m.task_covar_matrix())
        St = np.asarray(lik.task_covariance())
        dense = np.kron(K, B) + np.kron(np.eye(12), St)
        np.testing.assert_allclose(got, np.linalg.cond(dense), rtol=1e-6)

    def test_icm_training_config3(self):
        """Driver config 3: exact ICM/LMC with Matern kernel."""
        X, Y, F, _ = make_data(n=60, p=5, q=2)
        lik = pl.MultitaskGaussianLikelihood(num_tasks=5, rank=2)
        m = pl.MultitaskGPModel(X, Y, lik, n_tasks=5, n_latents=2,
                                model_type="ICM", kernel_type="matern")
        m2, info = fit(m, n_iter=200, lr=0.05, patience=50)
        pred = m2.posterior(X)
        rmse = np.sqrt(np.mean((np.asarray(pred.mean) - F) ** 2))
        assert rmse < 0.1
        var = m2.compute_var(X[:10])
        assert var.shape == (10, 5) and bool(jnp.all(var > 0))

    def test_icm_posterior_matches_dense(self):
        """ICM posterior mean/var vs brute-force dense computation."""
        X, Y, _, _ = make_data(n=18, p=3, q=2)
        Xs = np.linspace(-0.9, 0.9, 5)[:, None]
        lik = pl.MultitaskGaussianLikelihood(num_tasks=3, rank=1)
        m = pl.MultitaskGPModel(X, Y, lik, n_tasks=3, n_latents=2, model_type="ICM")
        pred = m.posterior(Xs, observed=True)

        K = np.asarray(m.covar_module(X))[0]
        B = np.asarray(m.task_covar_matrix())
        St = np.asarray(lik.task_covariance())
        Ks = np.asarray(m.covar_module(Xs, X))[0]
        Kss = np.asarray(m.covar_module(Xs))[0]
        dense = np.kron(K, B) + np.kron(np.eye(18), St)
        cross = np.kron(Ks, B)
        mean_prior = np.asarray(m.mean_module(X)).T
        sol = np.linalg.solve(dense, (np.asarray(Y) - mean_prior).reshape(-1))
        exp_mean = (cross @ sol).reshape(5, 3) + np.asarray(m.mean_module(Xs)).T
        prior_cov = np.kron(Kss, B) + np.kron(np.eye(5), St)
        corr = cross @ np.linalg.solve(dense, cross.T)
        exp_var = np.diag(prior_cov - corr).reshape(5, 3)
        np.testing.assert_allclose(np.asarray(pred.mean), exp_mean, rtol=1e-5, atol=1e-8)
        np.testing.assert_allclose(np.asarray(pred.variance), exp_var, rtol=1e-4, atol=1e-8)

    def test_lmc_posterior_matches_dense(self):
        X, Y, _, _ = make_data(n=15, p=3, q=2)
        Xs = np.linspace(-0.8, 0.8, 4)[:, None]
        lik = pl.MultitaskGaussianLikelihood(num_tasks=3, rank=0)
        m = pl.MultitaskGPModel(X, Y, lik, n_tasks=3, n_latents=2,
                                model_type="LMC", fix_diagonal=True)
        pred = m.posterior(Xs, observed=True)

        Ks_tr = np.asarray(m.covar_module(X))
        H = np.asarray(m.lmc_coefficients()).T
        St = np.asarray(lik.task_covariance() + jnp.diag(m._lmc_extra_diag()))
        dense = np.kron(np.eye(15), St)
        for b in range(2):
            dense += np.kron(Ks_tr[b], np.outer(H[:, b], H[:, b]))
        Kcross = np.asarray(m.covar_module(Xs, X))
        cross = sum(np.kron(Kcross[b], np.outer(H[:, b], H[:, b])) for b in range(2))
        mean_prior = np.asarray(m.mean_module(X)).T
        sol = np.linalg.solve(dense, (np.asarray(Y) - mean_prior).reshape(-1))
        exp_mean = (cross @ sol).reshape(4, 3) + np.asarray(m.mean_module(Xs)).T
        Kss = np.asarray(m.covar_module(Xs))
        prior = sum(np.kron(Kss[b], np.outer(H[:, b], H[:, b])) for b in range(2)) \
            + np.kron(np.eye(4), St)
        exp_var = np.diag(prior - cross @ np.linalg.solve(dense, cross.T)).reshape(4, 3)
        np.testing.assert_allclose(np.asarray(pred.mean), exp_mean, rtol=1e-5, atol=1e-8)
        np.testing.assert_allclose(np.asarray(pred.variance), exp_var, rtol=1e-4, atol=1e-8)


class TestMultitaskSGPR:
    """n_inducing_points routes ICM/LMC through the Nyström low-rank path
    (VERDICT r1 item 5 — it used to be stored and silently ignored)."""

    def test_sgpr_path_taken_and_differs_from_exact(self):
        X, Y, F, _ = make_data(n=50, p=3, q=2)
        lik = pl.MultitaskGaussianLikelihood(num_tasks=3, rank=0)
        m_ex = pl.MultitaskGPModel(X, Y, lik, n_tasks=3, n_latents=2,
                                   model_type="ICM")
        m_sp = pl.MultitaskGPModel(X, Y, lik, n_tasks=3, n_latents=2,
                                   model_type="ICM", n_inducing_points=10)
        assert m_sp.sgpr and not m_ex.sgpr
        v_ex, v_sp = float(m_ex.mll()), float(m_sp.mll())
        assert np.isfinite(v_sp) and abs(v_ex - v_sp) > 1e-8

    def test_sgpr_mll_matches_dense_nystrom(self):
        """SGPR MLL == dense log-prob of the Nyström covariance + Titsias
        trace correction, for both ICM and LMC."""
        X, Y, _, _ = make_data(n=25, p=3, q=2)
        for model_type in ("ICM", "LMC"):
            lik = pl.MultitaskGaussianLikelihood(num_tasks=3, rank=0)
            m = pl.MultitaskGPModel(X, Y, lik, n_tasks=3, n_latents=2,
                                    model_type=model_type, n_inducing_points=8)
            n, t = 25, 3
            roots, H_eff, St_eff, titsias = m._sgpr_structure(m.train_x)
            Ks = np.einsum("bik,bjk->bij", np.asarray(roots), np.asarray(roots))
            dense = np.kron(np.eye(n), np.asarray(St_eff))
            Hn = np.asarray(H_eff)
            for b in range(Hn.shape[1]):
                dense += np.kron(Ks[b], np.outer(Hn[:, b], Hn[:, b]))
            from scipy.stats import multivariate_normal
            expected = multivariate_normal.logpdf(
                np.asarray(Y).reshape(-1), mean=np.zeros(n * t), cov=dense)
            expected = (expected + float(titsias)) / (n * t)
            np.testing.assert_allclose(float(m.mll()), expected, rtol=1e-6)

    def test_sgpr_posterior_matches_dense_nystrom(self):
        """Posterior mean/var from the capacitance identity == brute force.

        sgpr_titsias_var=False pins the pure subset-of-regressors identity
        the dense-Nyström oracle below encodes; the default (True) must add
        exactly the Σ_b clip(kss_b − q_ss_b, 0)·H[:,b]² diag gap on top
        (Titsias variance — see TestSGPRPredictiveVariance)."""
        X, Y, _, _ = make_data(n=30, p=3, q=2)
        Xs = np.linspace(-1, 1, 9)[:, None]
        lik = pl.MultitaskGaussianLikelihood(num_tasks=3, rank=0)
        m = pl.MultitaskGPModel(X, Y, lik, n_tasks=3, n_latents=2,
                                model_type="LMC", n_inducing_points=8,
                                fix_diagonal=True, sgpr_titsias_var=False)
        pred = m.posterior(jnp.asarray(Xs), observed=True)
        n, t = 30, 3
        roots, H_eff, St_eff, _ = m._sgpr_structure(m.train_x)
        roots_s = m._nystrom_roots(jnp.asarray(Xs))
        Hn = np.asarray(H_eff)
        q = Hn.shape[1]
        Ks = np.einsum("bik,bjk->bij", np.asarray(roots), np.asarray(roots))
        Kx = np.einsum("bik,bjk->bij", np.asarray(roots_s), np.asarray(roots_s))
        Kc = np.einsum("bik,bjk->bij", np.asarray(roots_s), np.asarray(roots))
        Strain = np.kron(np.eye(n), np.asarray(St_eff))
        Stest = np.zeros((9 * t, 9 * t))
        Cross = np.zeros((9 * t, n * t))
        for b in range(q):
            hh = np.outer(Hn[:, b], Hn[:, b])
            Strain += np.kron(Ks[b], hh)
            Stest += np.kron(Kx[b], hh)
            Cross += np.kron(Kc[b], hh)
        mu = m.mean_module(m.train_x).T
        mus = m.mean_module(jnp.asarray(Xs)).T
        sol = np.linalg.solve(Strain, (np.asarray(Y) - np.asarray(mu)).reshape(-1))
        exp_mean = (Cross @ sol).reshape(9, t) + np.asarray(mus)
        exp_cov = Stest - Cross @ np.linalg.solve(Strain, Cross.T)
        exp_var = np.diag(exp_cov).reshape(9, t) + np.diag(np.asarray(St_eff))[None, :]
        np.testing.assert_allclose(np.asarray(pred.mean), exp_mean, atol=1e-6)
        np.testing.assert_allclose(np.asarray(pred.variance), exp_var,
                                   rtol=1e-5, atol=1e-8)
        # default flag: same mean, variance = SoR + the Titsias diag gap
        m_tit = pl.MultitaskGPModel(X, Y, lik, n_tasks=3, n_latents=2,
                                    model_type="LMC", n_inducing_points=8,
                                    fix_diagonal=True)
        pred_tit = m_tit.posterior(jnp.asarray(Xs), observed=True)
        kss = np.asarray(m_tit.covar_module(jnp.asarray(Xs), diag=True))
        qss = np.einsum("bik,bik->bi", np.asarray(roots_s),
                        np.asarray(roots_s))
        gap = np.clip(kss - qss, 0.0, None)                    # (q, 9)
        exp_var_tit = exp_var + gap.T @ (Hn * Hn).T
        np.testing.assert_allclose(np.asarray(pred_tit.mean), exp_mean,
                                   atol=1e-6)
        np.testing.assert_allclose(np.asarray(pred_tit.variance), exp_var_tit,
                                   rtol=1e-5, atol=1e-8)

    def test_iterative_lmc_posterior_conservative(self):
        """Matrix-free LMC posterior: exact mean (tight PCG), variance
        through the inflated-Nyström upper bound M_up >= Sigma — always
        >= the dense posterior variance, converging as rank -> n."""
        X, Y, F, _ = make_data(n=90, p=4, q=2)
        Xs = np.linspace(-0.9, 0.9, 15)[:, None]
        lik = pl.MultitaskGaussianLikelihood(num_tasks=4, rank=0)
        m = pl.MultitaskGPModel(X, Y, lik, n_tasks=4, n_latents=2,
                                model_type="LMC", kernel_type="matern",
                                mean_type="zero", fix_diagonal=True)
        cd = m.precompute_posterior(iterative=False)
        ci = m.precompute_posterior(iterative=True, precond_rank=30)
        pd_ = m.posterior(jnp.asarray(Xs), cache=cd, observed=True)
        pi_ = m.posterior(jnp.asarray(Xs), cache=ci, observed=True)
        np.testing.assert_allclose(np.asarray(pi_.mean), np.asarray(pd_.mean),
                                   atol=1e-5)
        vd, vi = np.asarray(pd_.variance), np.asarray(pi_.variance)
        assert np.all(vi >= vd - 1e-8)
        assert np.all(vi <= vd * 1.5 + 1e-6)   # and not uselessly loose

    def test_iterative_icm_posterior_conservative(self):
        """Matrix-free ICM posterior (the n>ICM_DENSE_N_MAX route — the
        dense path's n×n eigh kills the TPU compiler at n=16k): exact mean
        via PCG with the one-stream ICM matvec, conservative variance via
        the chol(B) pseudo-LMC cast with the Kronecker-factorized residual
        bound. Must match / upper-bound the dense joint-diagonalization
        posterior."""
        X, Y, F, _ = make_data(n=90, p=4, q=2)
        Xs = np.linspace(-0.9, 0.9, 15)[:, None]
        lik = pl.MultitaskGaussianLikelihood(num_tasks=4, rank=0)
        m = pl.MultitaskGPModel(X, Y, lik, n_tasks=4, n_latents=2,
                                model_type="ICM", kernel_type="matern",
                                mean_type="zero")
        cd = m.precompute_posterior(iterative=False)
        ci = m.precompute_posterior(iterative=True, precond_rank=30)
        pd_ = m.posterior(jnp.asarray(Xs), cache=cd, observed=True)
        pi_ = m.posterior(jnp.asarray(Xs), cache=ci, observed=True)
        np.testing.assert_allclose(np.asarray(pi_.mean), np.asarray(pd_.mean),
                                   atol=1e-5)
        vd, vi = np.asarray(pd_.variance), np.asarray(pi_.variance)
        assert np.all(vi >= vd - 1e-8)
        assert np.all(vi <= vd * 1.5 + 1e-6)   # and not uselessly loose
        # near-full rank: the bound collapses onto the exact variance
        cf = m.precompute_posterior(iterative=True, precond_rank=88)
        pf_ = m.posterior(jnp.asarray(Xs), cache=cf, observed=True)
        np.testing.assert_allclose(np.asarray(pf_.variance), vd,
                                   rtol=2e-2, atol=1e-4)

    def test_icm_iterative_stale_roots_rank(self):
        """Caller-supplied (possibly stale) preconditioner roots of a rank
        different from the default must not shape-clash with the probe draw:
        the probe rank is derived from the roots actually used."""
        X, Y, _, _ = make_data(n=48, p=3, q=2)
        lik = pl.MultitaskGaussianLikelihood(num_tasks=3, rank=0)
        m = pl.MultitaskGPModel(X, Y, lik, n_tasks=3, n_latents=2,
                                model_type="ICM")
        roots = m._precond_roots(m.train_x, 12)        # rank 12 != 256
        v_dense = float(m.mll(iterative=False))
        v = float(m.mll(iterative=True, key=jax.random.PRNGKey(0),
                        precond_roots=roots, num_probes=24,
                        max_cg_iters=400, cg_tol=1e-10))
        assert abs(v - v_dense) / abs(v_dense) < 2e-2

    def test_iterative_routing_threshold(self):
        """LMC auto-routes to the CG+SLQ path above DENSE_QN_MAX and the two
        paths agree on the MLL value."""
        X, Y, _, _ = make_data(n=40, p=3, q=2)
        lik = pl.MultitaskGaussianLikelihood(num_tasks=3, rank=0)
        m = pl.MultitaskGPModel(X, Y, lik, n_tasks=3, n_latents=2,
                                model_type="LMC")
        v_dense = float(m.mll(iterative=False))
        v_iter = float(m.mll(iterative=True, key=jax.random.PRNGKey(0),
                             num_probes=24, max_cg_iters=400, cg_tol=1e-10,
                             slq_steps=30))
        assert abs(v_iter - v_dense) / abs(v_dense) < 2e-2

    def test_icm_iterative_default_rank(self):
        """ICM iterative routing with the DEFAULT precond_rank=0 must not
        silently fall back to the O(T·n²)-memory dense path (it OOMed HBM at
        n=16k, T=7): a default Nyström rank is substituted, and the pcg MLL
        agrees with the dense joint-diagonalization value."""
        X, Y, _, _ = make_data(n=48, p=3, q=2)
        lik = pl.MultitaskGaussianLikelihood(num_tasks=3, rank=0)
        m = pl.MultitaskGPModel(X, Y, lik, n_tasks=3, n_latents=2,
                                model_type="ICM")
        v_dense = float(m.mll(iterative=False))
        # iterative=True + precond_rank=0 (the default) exercises the
        # substituted rank; tight CG makes the estimator near-exact
        v_iter = float(m.mll(iterative=True, key=jax.random.PRNGKey(0),
                             num_probes=24, max_cg_iters=400, cg_tol=1e-10))
        assert abs(v_iter - v_dense) / abs(v_dense) < 2e-2


class TestVariational:
    def test_whitened_trains_config4(self):
        """Driver config 4: variational LMC with LHC inducing points."""
        X, Y, F, _ = make_data(n=90, p=4, q=2)
        lik = pl.MultitaskGaussianLikelihood(num_tasks=4, rank=0)
        m = pl.VariationalMultitaskGPModel(
            X, n_latents=2, n_tasks=4, train_y=Y, init_lmc_coeffs=True,
            train_ind_ratio=1.5, kernel_type="matern", likelihood=lik,
            mean_type="zero")
        assert m.inducing_points.shape[0] == 60
        m2, info = fit(m, lambda mm: mm.elbo(), n_iter=400, lr=0.05, patience=60)
        pred = m2(X, observed=True)
        rmse = np.sqrt(np.mean((np.asarray(pred.mean) - F) ** 2))
        assert rmse < 0.12
        assert bool(jnp.all(pred.variance > 0))

    def test_svgp_minibatch_training(self):
        """SVI minibatch ELBO training (new capability; reference is
        full-batch only) reaches the same quality as full-batch."""
        from projected_lmc_tpu.training import fit_svgp_minibatch
        X, Y, F, _ = make_data(n=200, p=4, q=2)
        m = pl.VariationalMultitaskGPModel(
            X, n_latents=2, n_tasks=4, train_y=Y, init_lmc_coeffs=True,
            train_ind_ratio=4.0, mean_type="zero", kernel_type="matern")
        e0 = float(m.elbo())
        m2, info = fit_svgp_minibatch(m, batch_size=64, n_iter=400, lr=0.05,
                                      patience=100)
        assert -info["loss"] > e0
        pred = m2(jnp.asarray(X))
        rmse = float(np.sqrt(np.mean((np.asarray(pred.mean) - F) ** 2)))
        assert rmse < 0.15, rmse

    def test_kl_zero_at_prior(self):
        X, Y, _, _ = make_data(n=30, p=3, q=2)
        m = pl.VariationalMultitaskGPModel(X, n_latents=2, n_tasks=3, train_y=Y,
                                           mean_type="zero")
        # whitened init: q(u) = N(0, I) = prior -> KL == 0
        np.testing.assert_allclose(float(m.kl_divergence()), 0.0, atol=1e-10)

    def test_unwhitened_kl_zero_at_prior(self):
        X, Y, _, _ = make_data(n=25, p=3, q=2)
        m = pl.VariationalMultitaskGPModel(X, n_latents=2, n_tasks=3, train_y=Y,
                                           train_ind_ratio=1.0, mean_type="zero")
        assert not m.whitened
        np.testing.assert_allclose(float(m.kl_divergence()), 0.0, atol=1e-6)

    def test_distrib_mean_field(self):
        """``distrib`` argument (projected_lmc.py:737): mean-field q(u) at
        its S=I init agrees with the Cholesky S=I init exactly, and trains."""
        X, Y, F, _ = make_data(n=60, p=4, q=2)
        common = dict(n_latents=2, n_tasks=4, train_y=Y, init_lmc_coeffs=True,
                      train_ind_ratio=2.0, kernel_type="matern",
                      mean_type="zero")
        mc = pl.VariationalMultitaskGPModel(X, distrib="cholesky", **common)
        mf = pl.VariationalMultitaskGPModel(X, distrib="mean_field", **common)
        np.testing.assert_allclose(float(mf.elbo()), float(mc.elbo()),
                                   rtol=1e-10)
        np.testing.assert_allclose(float(mf.kl_divergence()),
                                   float(mc.kl_divergence()), atol=1e-10)
        m2, info = fit(mf, lambda mm: mm.elbo(), n_iter=200, lr=0.05,
                       patience=60)
        assert info["losses"][-1] < info["losses"][0]
        # the diagonal variance parameters actually moved
        assert np.abs(np.asarray(m2.var_chol_diag) - 1.0).max() > 1e-4

    def test_distrib_delta(self):
        """Delta (MAP) variational distribution: zero-covariance posterior,
        KL reduces to the whitened prior negative log-density of the mean."""
        X, Y, F, _ = make_data(n=60, p=4, q=2)
        m = pl.VariationalMultitaskGPModel(
            X, n_latents=2, n_tasks=4, train_y=Y, init_lmc_coeffs=True,
            train_ind_ratio=2.0, kernel_type="matern", mean_type="zero",
            distrib="delta")
        assert m._S_chol() is None
        n_ind = m.inducing_points.shape[0]
        expect_kl = 0.5 * n_ind * np.log(2 * np.pi) * m.n_latents
        np.testing.assert_allclose(float(m.kl_divergence()), expect_kl,
                                   rtol=1e-10)
        m2, info = fit(m, lambda mm: mm.elbo(), n_iter=300, lr=0.05,
                       patience=60)
        pred = m2(X, observed=True)
        rmse = np.sqrt(np.mean((np.asarray(pred.mean) - F) ** 2))
        assert rmse < 0.2, rmse

    def test_distrib_delta_unwhitened(self):
        """Regression: delta (S_chol=None) + explicit unwhitened strategy.
        The posterior must drop the interp·S·interpᵀ term (S=0), not crash,
        and the full-cov diagonal must equal the diag-var fast path."""
        X, Y, F, _ = make_data(n=60, p=4, q=2)
        m = pl.VariationalMultitaskGPModel(
            X, n_latents=2, n_tasks=4, train_y=Y, init_lmc_coeffs=True,
            train_ind_ratio=1.5, kernel_type="matern", mean_type="zero",
            var_strat="unwhitened", distrib="delta")
        assert not m.whitened and m._S_chol() is None
        mu, var = m.compute_latent_distrib(X)
        assert np.all(np.isfinite(np.asarray(mu)))
        assert np.all(np.asarray(var) >= 0)
        _, cov = m.compute_latent_distrib(X[:10], full_cov=True)
        np.testing.assert_allclose(
            np.diagonal(np.asarray(cov), axis1=-2, axis2=-1),
            np.asarray(m.compute_latent_distrib(X[:10])[1]),
            rtol=1e-8, atol=1e-10)
        assert np.isfinite(float(m.elbo()))

    def test_latent_distrib_prior_flag(self):
        """compute_latent_distrib(prior=True) returns the latent prior at x
        (projected_lmc.py:812-813 forwards prior= to the strategy): zero mean,
        kernel (co)variance, independent of the variational parameters."""
        X, Y, _, _ = make_data(n=40, p=4, q=2)
        m = pl.VariationalMultitaskGPModel(
            X, n_latents=2, n_tasks=4, train_y=Y, init_lmc_coeffs=True,
            train_ind_ratio=1.5, kernel_type="matern", mean_type="zero")
        mu, var = m.compute_latent_distrib(X, prior=True)
        np.testing.assert_allclose(np.asarray(mu), 0.0)
        np.testing.assert_allclose(np.asarray(var),
                                   np.asarray(m.covar_module(X, diag=True)),
                                   rtol=1e-6)
        _, cov = m.compute_latent_distrib(X[:8], full_cov=True, prior=True)
        np.testing.assert_allclose(np.asarray(cov),
                                   np.asarray(m.covar_module(X[:8])),
                                   rtol=1e-6)
        # and the prior is NOT the posterior once the var params move
        mu_p, _ = m.compute_latent_distrib(X)
        assert np.asarray(mu_p).shape == np.asarray(mu).shape

    def test_distrib_forced_cholesky_unwhitened(self):
        X, Y, _, _ = make_data(n=20, p=3, q=2)
        m = pl.VariationalMultitaskGPModel(X, n_latents=2, n_tasks=3,
                                           train_y=Y, train_ind_ratio=1.0,
                                           mean_type="zero",
                                           distrib="mean_field")
        assert m.distrib == "cholesky"   # reference forces it (:724-729)

    def test_var_strat_unwhitened_with_inducing(self):
        """``var_strat`` argument (projected_lmc.py:696,738): unwhitened
        strategy with a free LHC inducing set. q(u) initializes at the prior
        N(0, K_zz) -> KL == 0, and the two parametrizations are the same
        model: mapping whitened params (w, S_w) to u-space via u = L_zz w,
        S_u = L_zz S_w L_zzᵀ must reproduce the posterior, KL, and ELBO
        exactly. (Optimization QUALITY is not asserted — the unwhitened
        landscape is ill-conditioned through chol(K_zz), which is why
        gpytorch and the reference default to whitened at ratio != 1.)"""
        X, Y, F, _ = make_data(n=90, p=4, q=2)
        kw = dict(n_latents=2, n_tasks=4, train_y=Y, init_lmc_coeffs=True,
                  train_ind_ratio=1.5, kernel_type="matern", mean_type="zero")
        mu = pl.VariationalMultitaskGPModel(X, var_strat="unwhitened", **kw)
        assert not mu.whitened and mu.inducing_points.shape[0] == 60
        np.testing.assert_allclose(float(mu.kl_divergence()), 0.0, atol=1e-6)

        # train the whitened model, map its params into u-space
        mw = pl.VariationalMultitaskGPModel(X, **kw)
        mw, _ = fit(mw, lambda mm: mm.elbo(), n_iter=300, lr=0.05,
                    patience=100)
        Lzz = mw._kernel_factors()
        Sw = jnp.tril(mw.var_chol)
        mu = mu.replace(
            inducing_points=mw.inducing_points,
            covar_module=mw.covar_module, likelihood=mw.likelihood,
            lmc_coeffs=mw.lmc_coeffs,
            output_mean_module=mw.output_mean_module,
            var_mean=jnp.matmul(Lzz, mw.var_mean[..., None])[..., 0],
            var_chol=jnp.matmul(Lzz, Sw))
        pm_w, pv_w = mw.compute_latent_distrib(X)
        pm_u, pv_u = mu.compute_latent_distrib(X)
        np.testing.assert_allclose(np.asarray(pm_u), np.asarray(pm_w),
                                   atol=1e-5)
        np.testing.assert_allclose(np.asarray(pv_u), np.asarray(pv_w),
                                   atol=1e-5)
        np.testing.assert_allclose(float(mu.kl_divergence()),
                                   float(mw.kl_divergence()), rtol=1e-5)
        np.testing.assert_allclose(float(mu.elbo()), float(mw.elbo()),
                                   rtol=1e-6)

    def test_var_strat_default_and_validation(self):
        X, Y, _, _ = make_data(n=30, p=3, q=2)
        kw = dict(n_latents=2, n_tasks=3, train_y=Y, mean_type="zero",
                  train_ind_ratio=1.5)
        md = pl.VariationalMultitaskGPModel(X, **kw)
        mw = pl.VariationalMultitaskGPModel(X, var_strat="whitened", **kw)
        assert md.whitened and mw.whitened
        np.testing.assert_allclose(float(md.elbo()), float(mw.elbo()),
                                   rtol=1e-12)
        # ratio == 1 forces unwhitened regardless (:728)
        mu = pl.VariationalMultitaskGPModel(
            X, n_latents=2, n_tasks=3, train_y=Y, mean_type="zero",
            train_ind_ratio=1.0, var_strat="whitened")
        assert not mu.whitened
        with pytest.raises(ValueError):
            pl.VariationalMultitaskGPModel(X, var_strat="bogus", **kw)

    def test_var_strat_unwhitened_mean_field(self):
        """mean_field + unwhitened: diag init is sqrt(diag K_zz); ELBO and
        KL are finite and training moves the diagonal."""
        X, Y, _, _ = make_data(n=48, p=3, q=2)
        m = pl.VariationalMultitaskGPModel(
            X, n_latents=2, n_tasks=3, train_y=Y, train_ind_ratio=2.0,
            mean_type="zero", var_strat="unwhitened", distrib="mean_field")
        Kzz = np.asarray(m.covar_module(m.inducing_points))
        np.testing.assert_allclose(
            np.asarray(m.var_chol_diag),
            np.sqrt(np.diagonal(Kzz, axis1=-2, axis2=-1)), rtol=1e-5)
        assert np.isfinite(float(m.elbo()))
        assert np.isfinite(float(m.kl_divergence()))
        m2, info = fit(m, lambda mm: mm.elbo(), n_iter=150, lr=0.05,
                       patience=50)
        assert info["losses"][-1] < info["losses"][0]

    def test_sobol_inducing_points(self):
        """README-documented Sobol' alternative for the inducing design."""
        X, Y, _, _ = make_data(n=64, p=3, q=2)
        m = pl.VariationalMultitaskGPModel(X, n_latents=2, n_tasks=3,
                                           train_y=Y, train_ind_ratio=2.0,
                                           mean_type="zero",
                                           ind_point_method="sobol")
        pts = np.asarray(m.inducing_points)
        assert pts.shape == (32, 1)
        assert pts.min() >= -1.0 and pts.max() <= 1.0
        lhc = pl.VariationalMultitaskGPModel(X, n_latents=2, n_tasks=3,
                                             train_y=Y, train_ind_ratio=2.0,
                                             mean_type="zero")
        assert np.abs(pts - np.asarray(lhc.inducing_points)).max() > 1e-6


class TestProjected:
    def test_project_roundtrip(self):
        """project_data ∘ mix == identity on noiseless rank-q data."""
        X, Y, F, H = make_data(n=40, p=6, q=2, noise=0.0)
        m = pl.ProjectedGPModel(X, F, 6, 2, init_lmc_coeffs=True,
                                BDN=True, scalar_B=True, diagonal_B=True)
        proj = np.asarray(m.project_data(jnp.asarray(F)))     # (q, n)
        Hhat = np.asarray(m.lmc_coefficients())               # (q, p)
        recon = proj.T @ Hhat
        np.testing.assert_allclose(recon, F, atol=1e-4)

    def test_projection_matrix_identity(self):
        """T = R⁻ᵀQᵀ satisfies H T = I_q (pseudo-inverse property)."""
        X, Y, _, _ = make_data(n=40, p=5, q=2)
        m = pl.ProjectedGPModel(X, Y, 5, 2, init_lmc_coeffs=True,
                                BDN=False, diagonal_B=False, scalar_B=False)
        T = np.asarray(m.projection_matrix())                  # (p, q)
        H = np.asarray(m.lmc_coefficients())                   # (q, p)
        # BDN=False adds the M correction; with M=0 at init H T = I
        np.testing.assert_allclose(H @ T, np.eye(2), atol=1e-5)
        # perturb H so R is genuinely non-diagonal (post-training state):
        # T = Q R⁻ᵀ must still satisfy H T = I_q and Y T = project_data(Y).T
        rng = np.random.default_rng(3)
        H_pert = np.asarray(m.lmc_coefficients.H) \
            + 0.3 * rng.standard_normal(m.lmc_coefficients.H.shape)
        m = m.replace(lmc_coefficients=m.lmc_coefficients.replace(
            H=jnp.asarray(H_pert, m.lmc_coefficients.H.dtype)))
        T = np.asarray(m.projection_matrix())
        H = np.asarray(m.lmc_coefficients())
        np.testing.assert_allclose(H @ T, np.eye(2), atol=1e-5)
        np.testing.assert_allclose(np.asarray(Y) @ T,
                                   np.asarray(m.project_data(jnp.asarray(Y))).T,
                                   atol=1e-5)

    def test_prediction_cache_matches_uncached(self):
        """predict(cache=prediction_cache()) == self-contained predict, for
        both the dense and the SGPR (n_inducing_points) latent paths — the
        serving-side analog of gpytorch's prediction-strategy cache."""
        X, Y, _, _ = make_data(n=48, p=5, q=2)
        Xt = np.asarray(X)[:11] + 0.05
        for m_ind in (None, 16):
            m = pl.ProjectedGPModel(X, Y, 5, 2, init_lmc_coeffs=True,
                                    BDN=True, scalar_B=True, diagonal_B=True,
                                    n_inducing_points=m_ind)
            mean0, var0 = m.predict(jnp.asarray(Xt), observed=True)
            cache = m.prediction_cache()
            mean1, var1 = m.predict(jnp.asarray(Xt), observed=True,
                                    cache=cache)
            np.testing.assert_allclose(np.asarray(mean1), np.asarray(mean0),
                                       rtol=1e-6, atol=1e-7)
            np.testing.assert_allclose(np.asarray(var1), np.asarray(var0),
                                       rtol=1e-6, atol=1e-7)
            # the cache is a jit-traversable pytree (serving usage)
            import jax
            f = jax.jit(lambda mdl, c, xs: mdl.predict(xs, observed=True,
                                                       cache=c))
            mean2, var2 = f(m, cache, jnp.asarray(Xt))
            # jit refuses nothing but reassociates float reductions
            np.testing.assert_allclose(np.asarray(mean2), np.asarray(mean0),
                                       rtol=1e-4, atol=1e-5)

    def test_mll_variants_and_training_config5(self):
        """Driver config 5 (small): PLMC variants all train to low error."""
        X, Y, F, _ = make_data(n=70, p=6, q=2)
        for name, cfg in {
            "PLMC": dict(BDN=False, diagonal_B=False, scalar_B=False, diagonal_R=False),
            "PLMC_fast": dict(BDN=True, diagonal_B=True, scalar_B=True, diagonal_R=False),
            "oilmm": dict(BDN=True, diagonal_B=True, scalar_B=True, diagonal_R=True,
                          bulk=False),
        }.items():
            m = pl.ProjectedGPModel(X, Y, 6, 2, init_lmc_coeffs=True,
                                    kernel_type="matern", **cfg)
            m2, info = fit(m, pl.projected_lmc_mll, n_iter=250, lr=0.03, patience=50)
            mean, var = m2.predict(X)
            rmse = np.sqrt(np.mean((np.asarray(mean) - F) ** 2))
            assert rmse < 0.12, name
            assert bool(jnp.all(var > 0)), name

    def test_full_likelihood_psd_and_consistent(self):
        X, Y, _, _ = make_data(n=50, p=5, q=2)
        m = pl.ProjectedGPModel(X, Y, 5, 2, init_lmc_coeffs=True,
                                BDN=False, diagonal_B=False, scalar_B=False)
        fl = m.full_likelihood()
        Sigma = np.asarray(fl.task_covariance())
        np.testing.assert_allclose(Sigma, Sigma.T, atol=1e-10)
        assert np.linalg.eigvalsh(Sigma).min() > 0
        # B_tilde consistency with the scalar path
        m2 = pl.ProjectedGPModel(X, Y, 5, 2, init_lmc_coeffs=True,
                                 BDN=True, scalar_B=True, diagonal_B=True)
        Bt = np.asarray(m2.B_tilde())
        assert Bt.shape == (3, 3)
        np.testing.assert_allclose(Bt, np.diag(np.diag(Bt)), atol=1e-12)

    def test_projected_vs_batch_exact_latents(self):
        """On orthonormal mixing + shared noise, projected-GP latent posterior
        equals q independent exact GPs on the projected targets."""
        X, Y, _, _ = make_data(n=30, p=4, q=2)
        m = pl.ProjectedGPModel(X, Y, 4, 2, init_lmc_coeffs=True,
                                BDN=True, scalar_B=True, diagonal_B=True)
        proj = m.project_data(m.train_y_tasks)
        lat = m.compute_latent_distrib(X, full_cov=False)
        lik = pl.GaussianLikelihood(batch_shape=2)
        lik = lik.replace(raw_noise=m.likelihood.raw_noise,
                          constraint=m.likelihood.constraint)
        em = pl.ExactGPModel(X, np.asarray(proj), lik, n_tasks=2, mean_type="zero")
        em = em.replace(covar_module=m.covar_module)
        ep = em.posterior(X, full_cov=False)
        np.testing.assert_allclose(np.asarray(lat.mean), np.asarray(ep.mean), rtol=1e-6)

    def test_compute_loo_shapes(self):
        X, Y, _, _ = make_data(n=30, p=4, q=2)
        m = pl.ProjectedGPModel(X, Y, 4, 2, init_lmc_coeffs=True)
        s2, ym = m.compute_loo()
        assert s2.shape == (30, 2) and bool(jnp.all(s2 > 0))


class TestTwoPhaseFit:
    def test_two_phase_beats_coarse_only(self):
        """fit_two_phase (bf16 descent → fp32 refine) must end at least as
        good as the same budget spent purely on the bf16 estimator, judged
        by a common tight fp32 yardstick (the precision-floor experiment,
        results/PERF_NOTES.md, scaled down)."""
        from projected_lmc_tpu.training import fit, fit_two_phase
        rng = np.random.default_rng(0)
        n, t, q, d = 256, 5, 2, 3
        X = rng.uniform(-1, 1, (n, d)).astype(np.float32)
        U = np.stack([np.sin(2.0 * X @ w) for w in
                      rng.standard_normal((q, d))], 1)
        H = rng.standard_normal((q, t))
        Y = (U @ H + 0.1 * rng.standard_normal((n, t))).astype(np.float32)

        def make():
            lik = pl.MultitaskGaussianLikelihood(num_tasks=t, rank=0)
            return pl.MultitaskGPModel(X, Y, lik, n_tasks=t, n_latents=q,
                                       model_type="LMC", kernel_type="matern",
                                       mean_type="zero", fix_diagonal=True)

        coarse = lambda m, key: m.mll(key=key, iterative=True,
                                      max_cg_iters=16, cg_tol=2e-2,
                                      matvec_bf16=True, precond_rank=32,
                                      num_probes=4)
        fine = lambda m, key: m.mll(key=key, iterative=True, max_cg_iters=64,
                                    cg_tol=1e-5, precond_rank=32,
                                    num_probes=4)
        budget = 160
        kw = dict(lr=2e-2, patience=10_000, scan_steps=16)
        # same seed ⇒ the coarse-only run over n_coarse steps IS phase 1
        m_phase1, _ = fit(make(), coarse, n_iter=budget // 2, **kw)
        m_two, info = fit_two_phase(make(), coarse, fine, n_iter=budget,
                                    fine_frac=0.5, **kw)
        assert len(info["phases"]) == 2
        assert len(info["losses"]) >= budget - 2 * 16  # scan-chunk rounding

        yard = dict(iterative=True, max_cg_iters=400, cg_tol=1e-10,
                    precond_rank=64, num_probes=4,
                    key=jax.random.PRNGKey(7))
        mll_phase1 = float(m_phase1.mll(**yard))
        mll_two = float(m_two.mll(**yard))
        # the fp32 refinement must improve on the phase-1 endpoint (the
        # full floor comparison needs hundreds of steps — PERF_NOTES.md)
        assert mll_two > mll_phase1, (mll_two, mll_phase1)


class TestSGPRPredictiveVariance:
    """Regression tests for the round-5 SGPR variance-collapse fix: the
    predictive variance follows the Titsias posterior
    kss − q_ss + σ²·diag(R* cap⁻¹ R*ᵀ) by default, NOT the degenerate
    subset-of-regressors variance, which collapses to 0 far from the
    inducing points. This is a flagged improvement over the reference
    (gpytorch's InducingPointKernel corrects only the training loss, so its
    predictive variance collapses too); sgpr_titsias_var=False reproduces
    the reference's SoR behavior. Found via diag_sarcos experiment 1 —
    temporal-split SARCOS test points are far from train, so the shipped
    alpha_CI was computed with near-zero GP variance."""

    def _exact_sgpr(self, n=40, m_ind=12, noise=0.05, seed=0):
        rng = np.random.default_rng(seed)
        X = rng.uniform(-1, 1, (n, 1))
        y = np.sin(3 * X[:, 0]) + noise * rng.standard_normal(n)
        lik = pl.GaussianLikelihood(batch_shape=1, noise_init=noise)
        return pl.ExactGPModel(X, y, lik, n_tasks=1, kernel_type="rbf",
                               mean_type="zero", n_inducing_points=m_ind)

    def test_far_point_reverts_to_prior(self):
        m = self._exact_sgpr()
        X_far = np.array([[50.0], [-75.0]])   # many lengthscales away
        post = m.posterior(X_far, full_cov=False)
        kss = np.asarray(m.covar_module(jnp.asarray(X_far), diag=True))
        np.testing.assert_allclose(np.asarray(post.variance), kss,
                                   rtol=1e-4)

    def test_parity_flag_reproduces_sor_collapse(self):
        """sgpr_titsias_var=False gives the reference's degenerate SoR
        variance: ~0 far from the inducing points."""
        rng = np.random.default_rng(0)
        X = rng.uniform(-1, 1, (40, 1))
        y = np.sin(3 * X[:, 0])
        lik = pl.GaussianLikelihood(batch_shape=1, noise_init=0.05)
        m = pl.ExactGPModel(X, y, lik, n_tasks=1, kernel_type="rbf",
                            mean_type="zero", n_inducing_points=12,
                            sgpr_titsias_var=False)
        post = m.posterior(np.array([[50.0]]), full_cov=False)
        assert float(np.asarray(post.variance).max()) < 1e-6

    def test_matches_dense_titsias_posterior(self):
        """Exact parity with the dense Titsias q(f*) across near AND far
        test points, fp64 numpy reference."""
        m = self._exact_sgpr()
        Xs = np.concatenate([np.linspace(-1.2, 1.2, 7)[:, None],
                             np.array([[8.0], [30.0]])])
        R = np.asarray(m._low_rank_root(m.train_x), np.float64)[0]
        Rs = np.asarray(m._low_rank_root(jnp.asarray(Xs)), np.float64)[0]
        s2 = float(m.likelihood.noise[0, 0])
        cap = R.T @ R + s2 * np.eye(R.shape[1])
        kss = np.asarray(m.covar_module(jnp.asarray(Xs), diag=True),
                         np.float64)[0]
        want_var = (kss - np.einsum("ij,ij->i", Rs, Rs)
                    + s2 * np.einsum("ij,ij->i", Rs,
                                     np.linalg.solve(cap, Rs.T).T))
        delta = np.asarray(m.train_y, np.float64)
        want_mean = Rs @ np.linalg.solve(cap, R.T @ delta[0])
        post = m.posterior(jnp.asarray(Xs), full_cov=False)
        np.testing.assert_allclose(np.asarray(post.mean)[0], want_mean,
                                   rtol=1e-4, atol=1e-6)
        np.testing.assert_allclose(np.asarray(post.variance)[0], want_var,
                                   rtol=1e-4, atol=1e-6)
        # full_cov diagonal agrees with the diag path
        post_fc = m.posterior(jnp.asarray(Xs), full_cov=True)
        np.testing.assert_allclose(
            np.asarray(jnp.diagonal(post_fc.covariance_matrix, axis1=-2,
                                    axis2=-1))[0],
            np.asarray(post.variance)[0], rtol=1e-4, atol=1e-6)

    @pytest.mark.parametrize("model_type", ["ICM", "LMC"])
    def test_multitask_sgpr_far_point_prior(self, model_type):
        X, Y, _, _ = make_data(n=40, p=3, q=2)
        lik = pl.MultitaskGaussianLikelihood(num_tasks=3, rank=0)
        m = pl.MultitaskGPModel(X, Y, lik, n_tasks=3, n_latents=2,
                                model_type=model_type, n_inducing_points=10)
        X_far = np.full((2, X.shape[1]), 60.0)
        post = m.posterior(jnp.asarray(X_far), observed=True)
        kss = np.asarray(m.covar_module(jnp.asarray(X_far), diag=True),
                         np.float64)                      # (k, 2)
        if model_type == "ICM":
            B = np.asarray(m.task_covar_matrix(), np.float64)
            prior = kss[0][:, None] * np.diag(B)[None, :]
            noise_diag = np.diag(np.asarray(
                m.likelihood.task_covariance(), np.float64))
        else:
            H = np.asarray(m.covar_factor[..., 0].T, np.float64)  # (T, q)
            prior = kss.T @ (H ** 2).T
            # the LMC's effective noise carries the extra per-task diagonal
            # (same St_eff as _sgpr_structure)
            noise_diag = np.diag(np.asarray(
                m.likelihood.task_covariance(), np.float64)) + \
                np.asarray(m._lmc_extra_diag(), np.float64)
        prior = prior + noise_diag[None, :]
        np.testing.assert_allclose(np.asarray(post.variance), prior,
                                   rtol=2e-3)


class TestQRPrecisionGuard:
    """Regression guard for the round-4 TPU correctness fix (VERDICT r4
    item 7): ``LMCMixingMatrix.QR`` in bulk mode MUST run its QR under
    ``jax.default_matmul_precision("highest")``. On TPU the default matmul
    precision is bf16-grade; the resulting ~1e-3 Q-orthogonality error feeds
    Q⊥ into the B̃ noise terms every step and was measured to cost the
    full-B̃ PLMC its long-horizon test R² (0.938 vs the torch-fp64 oracle's
    0.980 at 40k — results/plmc_trajectory_jax*.json). CPU tests cannot see
    the TPU default, so the guard asserts the context manager itself is
    entered — removing it breaks this test on any backend."""

    def _mixing(self, p=6, q=3, mode="Q_plus"):
        rng = np.random.default_rng(0)
        A = rng.standard_normal((p, p))
        Qf, _ = np.linalg.qr(A)
        Q_plus = Qf if mode == "Q_plus" else Qf[:, :q]
        R = np.triu(rng.standard_normal((q, q))) + 2 * np.eye(q)
        from projected_lmc_tpu.models.projected import LMCMixingMatrix
        return LMCMixingMatrix(jnp.asarray(Q_plus), jnp.asarray(R), bulk=True)

    @pytest.mark.parametrize("mode", ["Q_plus", "Q"])
    def test_bulk_qr_enters_highest_precision(self, monkeypatch, mode):
        entered = []
        orig = jax.default_matmul_precision

        def spy(precision):
            entered.append(precision)
            return orig(precision)

        monkeypatch.setattr(jax, "default_matmul_precision", spy)
        mix = self._mixing(mode=mode)
        Q, R, Q_orth = mix.QR()
        assert entered == ["highest"], entered
        # and the decomposition it returns is actually orthogonal
        err = float(jnp.abs(Q.T @ Q - jnp.eye(Q.shape[1])).max())
        assert err < 1e-6, err
        if mode == "Q_plus":
            assert Q_orth is not None
            cross = float(jnp.abs(Q.T @ Q_orth).max())
            assert cross < 1e-6, cross

    def test_guard_survives_jit_trace(self, monkeypatch):
        """The QR runs inside the jitted training step; the context manager
        must wrap the TRACE of the qr primitive (precision is baked into the
        lowered program at trace time)."""
        entered = []
        orig = jax.default_matmul_precision

        def spy(precision):
            entered.append(precision)
            return orig(precision)

        monkeypatch.setattr(jax, "default_matmul_precision", spy)
        mix = self._mixing()

        @jax.jit
        def get_q(m):
            Q, _, _ = m.QR()
            return Q

        get_q(mix)
        assert "highest" in entered, entered


if __name__ == "__main__":
    pytest.main([__file__, "-x", "-q"])
