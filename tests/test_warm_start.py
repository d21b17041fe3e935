"""sgpr_warm_start: closed-form (Titsias) E-step for the SVGP-LMC model.

Validates (a) the warm start strictly improves the ELBO over the standard
zero-mean/prior-covariance init, (b) the warm-started posterior mean matches
the exact SGPR posterior computed densely on a small problem, and (c) all
three variational distributions and both strategies accept the warm start.
"""
import numpy as np
import pytest

import projected_lmc_tpu as pl


def make_data(n=64, p=4, q=2, noise=0.05, seed=0):
    rng = np.random.default_rng(seed)
    X = np.linspace(-1, 1, n)[:, None].astype(np.float32)
    L = np.stack([np.sin(3.0 * X[:, 0]), np.cos(2.0 * X[:, 0])], 1)[:, :q]
    H = rng.standard_normal((q, p)).astype(np.float32)
    F = L @ H
    Y = (F + noise * rng.standard_normal((n, p))).astype(np.float32)
    return X, Y, F


def build(X, Y, p=4, q=2, **kw):
    return pl.VariationalMultitaskGPModel(
        X, n_latents=q, n_tasks=p, train_y=Y, init_lmc_coeffs=True,
        mean_type="zero", kernel_type="matern", train_ind_ratio=1.5, **kw)


class TestSgprWarmStart:
    def test_elbo_improves(self):
        X, Y, _ = make_data()
        m = build(X, Y)
        e0 = float(m.elbo())
        mw = m.sgpr_warm_start()
        e1 = float(mw.elbo())
        assert e1 > e0 + 0.1, (e0, e1)

    def test_posterior_matches_dense_sgpr(self):
        """The warm-started latent mean equals the dense SGPR posterior mean
        μ(x) = K_xz Σ⁻¹ K_zx ỹ / σ², Σ = K_zz + K_zx K_xz/σ² (Titsias 2009),
        computed here directly in fp64."""
        X, Y, _ = make_data()
        m = build(X, Y).sgpr_warm_start()
        mu, _ = m.compute_latent_distrib(X)
        # dense reference
        H = np.asarray(m.lmc_coefficients(), np.float64)
        L_t, *_ = np.linalg.lstsq(H.T, np.asarray(Y, np.float64).T, rcond=None)
        # warm start's default σ²: mean diag of the FULL task covariance
        # (incl. global noise) — the noise the ELBO actually uses
        noise = float(np.mean(np.diag(
            np.asarray(m.likelihood.task_covariance(), np.float64))))
        z = np.asarray(m.inducing_points)
        Kzz = np.asarray(m.covar_module(z), np.float64)
        Kzx = np.asarray(m.covar_module(z, X), np.float64)
        for b in range(2):
            mm = Kzz[b].shape[0]
            Kb = Kzz[b] + 1e-6 * np.eye(mm)
            Sig = Kb + Kzx[b] @ Kzx[b].T / noise
            mu_dense = Kzx[b].T @ np.linalg.solve(Sig, Kzx[b] @ L_t[b]) / noise
            np.testing.assert_allclose(np.asarray(mu)[b], mu_dense,
                                       rtol=5e-3, atol=5e-3)

    def test_prediction_quality_without_training(self):
        """On smooth latents the warm-started (untrained) model should already
        predict near the injected noise level — the property that rescues the
        tidal config where ELBO hyperparameter training collapses."""
        X, Y, F = make_data(noise=0.05)
        m = build(X, Y).sgpr_warm_start()
        pred = m(X, observed=True)
        rmse = float(np.sqrt(np.mean((np.asarray(pred.mean) - F) ** 2)))
        assert rmse < 0.16, rmse

    @pytest.mark.parametrize("distrib", ["cholesky", "mean_field", "delta"])
    def test_distribs(self, distrib):
        X, Y, _ = make_data()
        m = build(X, Y, distrib=distrib)
        mw = m.sgpr_warm_start()
        assert float(np.abs(np.asarray(mw.var_mean)).max()) > 0.01
        assert np.isfinite(float(mw.elbo()))

    def test_unwhitened(self):
        X, Y, F = make_data()
        m = build(X, Y, var_strat="unwhitened").sgpr_warm_start()
        pred = m(X, observed=True)
        rmse = float(np.sqrt(np.mean((np.asarray(pred.mean) - F) ** 2)))
        assert rmse < 0.16, rmse

    def test_requires_targets(self):
        X, Y, _ = make_data()
        m = pl.VariationalMultitaskGPModel(X, n_latents=2, n_tasks=4,
                                           mean_type="zero")
        with pytest.raises(ValueError):
            m.sgpr_warm_start()


class TestNoiseMstep:
    """Exact ELBO coordinate maximization over Σt (noise_mstep) and the
    E/M alternation (sgpr_em) — the round-4 calibration fix for the shipped
    warm-start-only σ (realdata_study_tidal_var.csv PVA −2.61)."""

    def test_mstep_improves_elbo(self):
        X, Y, _ = make_data()
        m = build(X, Y).sgpr_warm_start()
        e0 = float(m.elbo())
        m2 = m.noise_mstep()
        e1 = float(m2.elbo())
        assert e1 > e0 - 1e-6, (e0, e1)

    def test_mstep_is_elbo_stationary_point(self):
        """After the M-step, scaling Σt by (1±ε) must DECREASE the ELBO —
        Σt* is the coordinate maximizer."""
        X, Y, _ = make_data()
        m = build(X, Y).sgpr_warm_start().noise_mstep()
        e_star = float(m.elbo())
        lik = m.likelihood
        for s in (0.8, 1.25):
            lik_s = lik.set_noise(float(np.asarray(lik.noise)[0]) * s)
            if lik.rank > 0:
                lik_s = lik_s.replace(
                    task_noise_covar_factor=lik.task_noise_covar_factor
                    * np.sqrt(s))
            e_s = float(m.replace(likelihood=lik_s).elbo())
            assert e_s <= e_star + 1e-6, (s, e_s, e_star)

    def test_em_calibrates_sigma(self):
        """After sgpr_em, predictive σ should match the residual scale
        (the PVA ≈ 0 property the shipped default was missing)."""
        X, Y, F = make_data(noise=0.1)
        m = build(X, Y).sgpr_em()
        pred = m(X, observed=True)
        resid2 = np.mean((np.asarray(pred.mean) - np.asarray(Y)) ** 2)
        mean_var = float(np.mean(np.asarray(pred.variance)))
        pva = float(np.log(mean_var / resid2))
        assert abs(pva) < 0.7, pva
        e_init = float(build(X, Y).elbo())
        assert float(m.elbo()) > e_init

    def test_rank0_diag_likelihood(self):
        X, Y, _ = make_data()
        lik = pl.MultitaskGaussianLikelihood(num_tasks=4, rank=0)
        m = build(X, Y, likelihood=lik).sgpr_em(n_steps=1)
        assert np.all(np.isfinite(np.asarray(m.likelihood.task_noises)))
        assert np.isfinite(float(m.elbo()))
