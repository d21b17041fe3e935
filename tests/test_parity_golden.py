"""Cross-framework parity: JAX models vs an independent torch-fp64 oracle.

gpytorch itself is not installable in this environment, so the oracle is a
from-scratch torch implementation of the textbook GP identities the reference
delegates to gpytorch (dense Cholesky math, no shared code with the JAX
package). Hyperparameters are SET explicitly on both sides, so these tests
pin the *math paths* — kernels, MLLs, posteriors, the projected-LMC loss —
to 1e-5 and better (BASELINE.md 'posteriors match to 1e-5' target).
"""

import math

import numpy as np
import pytest
import torch

import jax.numpy as jnp

import projected_lmc_tpu as pl
from projected_lmc_tpu.models.exact import ExactGPModel
from projected_lmc_tpu.models.multitask import MultitaskGPModel
from projected_lmc_tpu.models.projected import ProjectedGPModel
from projected_lmc_tpu.mlls import projected_lmc_mll

torch.set_default_dtype(torch.float64)


# ----------------------------------------------------------------- torch side
def t_rbf(x1, x2, ls):
    a, b = x1 / ls, x2 / ls
    d2 = (a * a).sum(-1)[:, None] + (b * b).sum(-1)[None, :] - 2 * a @ b.T
    return torch.exp(-0.5 * d2.clamp_min(0))


def t_matern25(x1, x2, ls):
    a, b = x1 / ls, x2 / ls
    d2 = ((a * a).sum(-1)[:, None] + (b * b).sum(-1)[None, :]
          - 2 * a @ b.T).clamp_min(1e-30)
    r = d2.sqrt()
    c = math.sqrt(5.0) * r
    return (1 + c + (5.0 / 3.0) * d2) * torch.exp(-c)


def t_gp_logprob(K, noise, y):
    n = K.shape[0]
    L = torch.linalg.cholesky(K + noise * torch.eye(n))
    a = torch.cholesky_solve(y[:, None], L)[:, 0]
    return -0.5 * (y @ a + 2 * L.diagonal().log().sum()
                   + n * math.log(2 * math.pi))


def t_gp_posterior(K, Ks, Kss_diag, noise, y):
    n = K.shape[0]
    L = torch.linalg.cholesky(K + noise * torch.eye(n))
    a = torch.cholesky_solve(y[:, None], L)[:, 0]
    mean = Ks @ a
    V = torch.linalg.solve_triangular(L, Ks.T, upper=False)
    var = Kss_diag - (V * V).sum(0)
    return mean, var


def data(n=14, d=2, p=5, q=2, seed=0):
    rng = np.random.default_rng(seed)
    X = rng.uniform(-1, 1, (n, d))
    U = np.stack([np.sin(2 * X[:, 0] + X[:, 1]), np.cos(3 * X[:, 0])], axis=1)[:, :q]
    H = rng.standard_normal((q, p))
    Y = U @ H + 0.05 * rng.standard_normal((n, p))
    Xs = rng.uniform(-1, 1, (6, d))
    return X, Y, Xs


class TestExactParity:
    def test_single_output_mll_and_posterior(self):
        X, Y, Xs = data()
        y = Y[:, 0]
        ls, noise = np.array([0.7, 1.3]), 0.013

        lik = pl.GaussianLikelihood(batch_shape=1, dtype=jnp.float64).set_noise(noise)
        m = ExactGPModel(jnp.asarray(X), jnp.asarray(y), lik, n_tasks=1,
                         kernel_type="rbf", mean_type="zero")
        m = m.replace(covar_module=m.covar_module.set_lengthscale(
            jnp.asarray(ls)[None, None, :]))

        tX, tXs, ty, tls = map(torch.as_tensor, (X, Xs, y, ls))
        K = t_rbf(tX, tX, tls)
        exp_mll = float(t_gp_logprob(K, noise, ty)) / len(y)
        np.testing.assert_allclose(float(m.mll()), exp_mll, rtol=1e-9)

        exp_mean, exp_var = t_gp_posterior(
            K, t_rbf(tXs, tX, tls), t_rbf(tXs, tXs, tls).diagonal(), noise, ty)
        post = m.posterior(jnp.asarray(Xs), full_cov=False)
        np.testing.assert_allclose(np.asarray(post.mean)[0],
                                   exp_mean.numpy(), atol=1e-9)
        np.testing.assert_allclose(np.asarray(post.variance)[0],
                                   exp_var.numpy(), atol=1e-9)

    def test_batched_multitask_matern(self):
        X, Y, Xs = data(p=3)
        ls = np.array([[0.6, 1.1], [0.9, 0.8], [1.4, 0.5]])    # (T, d)
        noises = np.array([0.01, 0.02, 0.03])

        lik = pl.GaussianLikelihood(batch_shape=3, dtype=jnp.float64).set_noise(
            jnp.asarray(noises)[:, None])
        m = ExactGPModel(jnp.asarray(X), jnp.asarray(Y), lik, n_tasks=3,
                         kernel_type="matern", mean_type="zero")
        m = m.replace(covar_module=m.covar_module.set_lengthscale(
            jnp.asarray(ls)[:, None, :]))

        got_ll = np.asarray(m.log_marginal())
        post = m.posterior(jnp.asarray(Xs), full_cov=False)
        for t in range(3):
            tX, tXs, ty = map(torch.as_tensor, (X, Xs, Y[:, t]))
            tls = torch.as_tensor(ls[t])
            K = t_matern25(tX, tX, tls)
            np.testing.assert_allclose(got_ll[t],
                                       float(t_gp_logprob(K, noises[t], ty)),
                                       rtol=1e-9)
            em, ev = t_gp_posterior(K, t_matern25(tXs, tX, tls),
                                    t_matern25(tXs, tXs, tls).diagonal(),
                                    noises[t], ty)
            np.testing.assert_allclose(np.asarray(post.mean)[t], em.numpy(),
                                       atol=1e-9)
            np.testing.assert_allclose(np.asarray(post.variance)[t], ev.numpy(),
                                       atol=1e-9)


class TestMultitaskParity:
    def _icm_setup(self):
        X, Y, Xs = data(n=12, p=3)
        ls = np.array([0.9, 1.2])
        F = np.random.default_rng(3).standard_normal((3, 2)) * 0.7
        raw_var = np.array([-2.0, -1.0, -3.0])
        task_noises = np.array([0.02, 0.01, 0.015])

        lik = pl.MultitaskGaussianLikelihood(num_tasks=3, rank=0,
                                             has_global_noise=False,
                                             dtype=jnp.float64)
        lik = lik.replace(raw_task_noises=lik.constraint.inverse(
            jnp.asarray(task_noises)))
        m = MultitaskGPModel(jnp.asarray(X), jnp.asarray(Y), lik, n_tasks=3,
                             n_latents=2, model_type="ICM", kernel_type="rbf",
                             mean_type="zero")
        m = m.replace(covar_module=m.covar_module.set_lengthscale(
            jnp.asarray(ls)[None, None, :]),
            covar_factor=jnp.asarray(F), raw_var=jnp.asarray(raw_var))
        B = F @ F.T + np.diag(np.log1p(np.exp(raw_var)))       # softplus
        return X, Y, Xs, ls, B, task_noises, m

    def test_icm_mll_and_posterior(self):
        X, Y, Xs, ls, B, task_noises, m = self._icm_setup()
        n, T = Y.shape
        tX, tXs, tls = map(torch.as_tensor, (X, Xs, ls))
        K = t_rbf(tX, tX, tls)
        Sig = (torch.kron(K, torch.as_tensor(B))
               + torch.kron(torch.eye(n), torch.diag(torch.as_tensor(task_noises))))
        yv = torch.as_tensor(Y).reshape(-1)
        L = torch.linalg.cholesky(Sig)
        a = torch.cholesky_solve(yv[:, None], L)[:, 0]
        exp_mll = float(-0.5 * (yv @ a + 2 * L.diagonal().log().sum()
                                + n * T * math.log(2 * math.pi))) / (n * T)
        # the Kronecker joint-eig path adds 1e-8 jitter to K (kron.py:47)
        np.testing.assert_allclose(float(m.mll()), exp_mll, rtol=1e-6)

        Cross = torch.kron(t_rbf(tXs, tX, tls), torch.as_tensor(B))
        exp_mean = (Cross @ a).reshape(len(Xs), T)
        Kss = torch.kron(t_rbf(tXs, tXs, tls), torch.as_tensor(B))
        cov = Kss - Cross @ torch.cholesky_solve(Cross.T, L)
        exp_var = cov.diagonal().reshape(len(Xs), T) \
            + torch.as_tensor(task_noises)[None, :]
        pred = m.posterior(jnp.asarray(Xs), observed=True)
        np.testing.assert_allclose(np.asarray(pred.mean), exp_mean.numpy(),
                                   atol=1e-6)
        np.testing.assert_allclose(np.asarray(pred.variance), exp_var.numpy(),
                                   rtol=5e-6, atol=1e-8)

    def test_lmc_mll_and_posterior(self):
        X, Y, Xs = data(n=11, p=4)
        n, T, q = 11, 4, 2
        ls = np.array([[0.8, 1.0], [1.3, 0.6]])
        Hmix = np.random.default_rng(5).standard_normal((T, q))
        task_noises = np.array([0.02, 0.01, 0.03, 0.025])

        lik = pl.MultitaskGaussianLikelihood(num_tasks=T, rank=0,
                                             has_global_noise=False,
                                             dtype=jnp.float64)
        lik = lik.replace(raw_task_noises=lik.constraint.inverse(
            jnp.asarray(task_noises)))
        m = MultitaskGPModel(jnp.asarray(X), jnp.asarray(Y), lik, n_tasks=T,
                             n_latents=q, model_type="LMC",
                             kernel_type="matern", mean_type="zero",
                             fix_diagonal=True)
        m = m.replace(covar_module=m.covar_module.set_lengthscale(
            jnp.asarray(ls)[:, None, :]),
            covar_factor=jnp.asarray(Hmix.T[..., None]))

        tX, tXs = torch.as_tensor(X), torch.as_tensor(Xs)
        extra = float(np.log1p(np.exp(-10.0))) * q      # frozen raw_var softplus
        St = torch.diag(torch.as_tensor(task_noises) + extra)
        Sig = torch.kron(torch.eye(n), St)
        for b in range(q):
            Kb = t_matern25(tX, tX, torch.as_tensor(ls[b]))
            hb = torch.as_tensor(Hmix[:, b])
            Sig = Sig + torch.kron(Kb, torch.outer(hb, hb))
        yv = torch.as_tensor(Y).reshape(-1)
        L = torch.linalg.cholesky(Sig)
        a = torch.cholesky_solve(yv[:, None], L)[:, 0]
        exp_mll = float(-0.5 * (yv @ a + 2 * L.diagonal().log().sum()
                                + n * T * math.log(2 * math.pi))) / (n * T)
        # dense woodbury adds jitter=1e-6 to the latent kernels
        Sig_j = Sig.clone()
        for b in range(q):
            hb = torch.as_tensor(Hmix[:, b])
            Sig_j += torch.kron(1e-6 * torch.eye(n), torch.outer(hb, hb))
        Lj = torch.linalg.cholesky(Sig_j)
        aj = torch.cholesky_solve(yv[:, None], Lj)[:, 0]
        exp_mll_j = float(-0.5 * (yv @ aj + 2 * Lj.diagonal().log().sum()
                                  + n * T * math.log(2 * math.pi))) / (n * T)
        got = float(m.mll())
        assert abs(got - exp_mll_j) < 1e-9 or abs(got - exp_mll) < 1e-6

        Cross = torch.zeros(len(Xs) * T, n * T)
        Kss_diag = torch.zeros(len(Xs), T)
        for b in range(q):
            tls = torch.as_tensor(ls[b])
            hb = torch.as_tensor(Hmix[:, b])
            Cross += torch.kron(t_matern25(tXs, tX, tls), torch.outer(hb, hb))
            Kss_diag += torch.outer(t_matern25(tXs, tXs, tls).diagonal(), hb * hb)
        exp_mean = (Cross @ aj).reshape(len(Xs), T)
        corr = Cross @ torch.cholesky_solve(Cross.T, Lj)
        exp_var = (Kss_diag + St.diagonal()[None, :]
                   - corr.diagonal().reshape(len(Xs), T))
        pred = m.posterior(jnp.asarray(Xs), observed=True)
        np.testing.assert_allclose(np.asarray(pred.mean), exp_mean.numpy(),
                                   atol=1e-6)
        np.testing.assert_allclose(np.asarray(pred.variance), exp_var.numpy(),
                                   rtol=1e-5, atol=1e-7)


class TestProjectedParity:
    def test_projected_mll_and_latent_posterior(self):
        """PLMC_fast (BDN ∧ scalar_B) loss + latent posterior vs torch oracle
        implementing the paper's formulas from scratch."""
        X, Y, Xs = data(n=14, p=5, q=2)
        n, p, q = 14, 5, 2
        ls = np.array([[0.7, 0.9], [1.1, 1.3]])
        latent_noises = np.array([0.011, 0.017])
        logB = -2.7

        m = ProjectedGPModel(jnp.asarray(X), jnp.asarray(Y), p, q,
                             init_lmc_coeffs=True, kernel_type="matern",
                             BDN=True, scalar_B=True, diagonal_B=True)
        m = m.replace(
            covar_module=m.covar_module.set_lengthscale(jnp.asarray(ls)[:, None, :]),
            likelihood=m.likelihood.set_noise(jnp.asarray(latent_noises)[:, None]),
            log_B_tilde_raw=jnp.full((p - q,), logB, jnp.float64))

        # oracle: QR of the model's own H (paper: T(Y) = R^-1 Q^T Y^T)
        H = torch.as_tensor(np.asarray(m.lmc_coefficients()).T)   # (p, q)
        Qt, Rt = torch.linalg.qr(H, mode="complete")
        Q, R, Q_orth = Qt[:, :q], Rt[:q, :q], Qt[:, q:]
        tY = torch.as_tensor(Y)
        proj = torch.linalg.solve_triangular(R, Q.T @ tY.T, upper=True)  # (q, n)

        tX = torch.as_tensor(X)
        latent = 0.0
        for b in range(q):
            Kb = t_matern25(tX, tX, torch.as_tensor(ls[b]))
            latent = latent + t_gp_logprob(Kb, latent_noises[b], proj[b])
        term0 = -0.5 * (p - q) * logB
        term1 = -0.5 * math.exp(-logB) * float((tY**2).sum() - (tY @ Q).pow(2).sum()) / n
        term2 = -0.5 * float(R.diagonal().pow(2).log().sum())
        exp_mll = float(latent) / n + term0 + term1 + term2 \
            - 0.5 * (p - q) * math.log(2 * math.pi)
        np.testing.assert_allclose(float(projected_lmc_mll(m)), exp_mll,
                                   rtol=1e-9)

        # latent posterior parity
        lat = m.compute_latent_distrib(jnp.asarray(Xs), full_cov=False)
        tXs = torch.as_tensor(Xs)
        for b in range(q):
            tls = torch.as_tensor(ls[b])
            Kb = t_matern25(tX, tX, tls)
            em, ev = t_gp_posterior(Kb, t_matern25(tXs, tX, tls),
                                    t_matern25(tXs, tXs, tls).diagonal(),
                                    latent_noises[b], proj[b])
            np.testing.assert_allclose(np.asarray(lat.mean)[b], em.numpy(),
                                       atol=1e-8)
            np.testing.assert_allclose(np.asarray(lat.variance)[b], ev.numpy(),
                                       atol=1e-8)

        # task-space prediction: mean = latent_mean^T H^T; var adds the
        # reconstructed Sigma = exp(logB)(I - QQ^T) + (QR)diag(sig)(QR)^T
        mean, var = m.predict(jnp.asarray(Xs), observed=True)
        QR_ = (Q @ R).numpy()
        lat_mean = np.stack([
            t_gp_posterior(t_matern25(tX, tX, torch.as_tensor(ls[b])),
                           t_matern25(tXs, tX, torch.as_tensor(ls[b])),
                           t_matern25(tXs, tXs, torch.as_tensor(ls[b])).diagonal(),
                           latent_noises[b], proj[b])[0].numpy()
            for b in range(q)])
        exp_mean = lat_mean.T @ QR_.T
        np.testing.assert_allclose(np.asarray(mean), exp_mean, atol=1e-8)
        Sigma = (math.exp(logB) * (np.eye(p) - (Q @ Q.T).numpy())
                 + QR_ @ np.diag(latent_noises) @ QR_.T + 1e-6 * np.eye(p))
        lat_var = np.stack([
            t_gp_posterior(t_matern25(tX, tX, torch.as_tensor(ls[b])),
                           t_matern25(tXs, tX, torch.as_tensor(ls[b])),
                           t_matern25(tXs, tXs, torch.as_tensor(ls[b])).diagonal(),
                           latent_noises[b], proj[b])[1].numpy()
            for b in range(q)])
        exp_var = lat_var.T @ (QR_.T**2) + np.diag(Sigma)[None, :]
        np.testing.assert_allclose(np.asarray(var), exp_var, rtol=1e-6,
                                   atol=1e-9)


class TestVariationalParity:
    """Whitened/unwhitened SVGP-LMC ELBO + latent posterior vs a torch-fp64
    oracle implementing the standard sparse-variational equations from
    scratch (gpytorch VariationalELBO semantics, projected_lmc.py:686-813).
    Hyperparameters and variational parameters are SET identically on both
    sides; the oracle shares no code with the JAX package."""

    def _setup(self, var_strat):
        from projected_lmc_tpu.models.variational import VariationalMultitaskGPModel
        X, Y, Xs = data(n=16, p=4, q=2, seed=3)
        n, p, q = 16, 4, 2
        rng = np.random.default_rng(7)
        ls = np.array([[0.8, 1.2], [0.6, 1.0]])
        task_noises = np.array([0.02, 0.03, 0.04, 0.05])
        global_noise = 0.01
        W = rng.standard_normal((q, p))

        lik = pl.MultitaskGaussianLikelihood(num_tasks=p, rank=0,
                                             dtype=jnp.float64)
        lik = lik.set_noise(global_noise).replace(
            raw_task_noises=lik.constraint.inverse(jnp.asarray(task_noises)))
        m = VariationalMultitaskGPModel(
            jnp.asarray(X), n_latents=q, n_tasks=p, train_y=jnp.asarray(Y),
            train_ind_ratio=2.0, kernel_type="matern", mean_type="zero",
            likelihood=lik, var_strat=var_strat)
        n_ind = m.inducing_points.shape[0]
        vm = rng.standard_normal((q, n_ind))
        vc = np.tril(0.1 * rng.standard_normal((q, n_ind, n_ind)))
        for b in range(q):
            np.fill_diagonal(vc[b], np.abs(np.diag(vc[b])) + 0.5)
        m = m.replace(
            covar_module=m.covar_module.set_lengthscale(
                jnp.asarray(ls)[:, None, :]),
            lmc_coeffs=jnp.asarray(W),
            var_mean=jnp.asarray(vm), var_chol=jnp.asarray(vc))
        Z = np.asarray(m.inducing_points)
        Sigma_t = np.diag(task_noises) + global_noise * np.eye(p)
        return m, (X, Y, Xs, Z, ls, W, vm, vc, Sigma_t, n, p, q, n_ind)

    def _oracle_latent(self, X, Z, ls, vm, vc, whitened):
        """Returns per-latent (mean (q,n), var (q,n)) plus the KL, in torch."""
        tX, tZ = torch.as_tensor(X), torch.as_tensor(Z)
        q, n_ind = vm.shape[0], Z.shape[0]
        means, varis, kl = [], [], 0.0
        for b in range(q):
            tls = torch.as_tensor(ls[b])
            Kzz = t_matern25(tZ, tZ, tls) + 1e-6 * torch.eye(n_ind)
            Kxz = t_matern25(tX, tZ, tls)
            kxx = t_matern25(tX, tX, tls).diagonal()
            L = torch.linalg.cholesky(Kzz)
            S_chol = torch.as_tensor(vc[b])
            mb = torch.as_tensor(vm[b])
            if whitened:
                A = torch.linalg.solve_triangular(L, Kxz.T, upper=False).T
                mean = A @ mb
                AS = A @ S_chol
                var = kxx - (A * A).sum(-1) + (AS * AS).sum(-1)
                kl = kl + 0.5 * ((S_chol * S_chol).sum() + mb @ mb - n_ind
                                 - S_chol.diagonal().pow(2).log().sum())
            else:
                interp = torch.cholesky_solve(Kxz.T, L).T
                mean = interp @ mb
                ILz = interp @ L
                IS = interp @ S_chol
                var = kxx - (ILz * ILz).sum(-1) + (IS * IS).sum(-1)
                iLS = torch.linalg.solve_triangular(L, S_chol, upper=False)
                w = torch.linalg.solve_triangular(L, mb[:, None],
                                                  upper=False)[:, 0]
                kl = kl + 0.5 * ((iLS * iLS).sum() + w @ w - n_ind
                                 + 2 * L.diagonal().log().sum()
                                 - S_chol.diagonal().pow(2).log().sum())
            means.append(mean)
            varis.append(var.clamp_min(1e-12))
        return torch.stack(means), torch.stack(varis), kl

    @pytest.mark.parametrize("var_strat", ["whitened", "unwhitened"])
    def test_elbo_and_latent_posterior(self, var_strat):
        m, (X, Y, Xs, Z, ls, W, vm, vc, Sigma_t, n, p, q, n_ind) = \
            self._setup(var_strat)
        mean_o, var_o, kl_o = self._oracle_latent(
            X, Z, ls, vm, vc, whitened=(var_strat == "whitened"))

        mean_j, var_j = m.compute_latent_distrib(jnp.asarray(X))
        np.testing.assert_allclose(np.asarray(mean_j), mean_o.numpy(),
                                   atol=1e-9)
        np.testing.assert_allclose(np.asarray(var_j), var_o.numpy(),
                                   atol=1e-9)
        np.testing.assert_allclose(float(m.kl_divergence()), float(kl_o),
                                   rtol=1e-10)

        # expected log-likelihood under the multitask Gaussian noise
        tW = torch.as_tensor(W)
        tSig = torch.as_tensor(Sigma_t)
        delta = torch.as_tensor(Y) - mean_o.T @ tW
        Sinv = torch.linalg.inv(tSig)
        quad = (delta @ Sinv * delta).sum()
        wsw = (tW @ Sinv @ tW.T).diagonal()
        trace = (var_o * wsw[:, None]).sum()
        logdet = torch.linalg.slogdet(tSig)[1]
        exp_ll = -0.5 * (quad + trace + n * (logdet + p * math.log(2 * math.pi)))
        elbo_o = float(exp_ll - kl_o) / n
        np.testing.assert_allclose(float(m.elbo()), elbo_o, rtol=1e-10)

        # task-level prediction at held-out points
        pred = m(jnp.asarray(Xs), observed=True)
        mean_s, var_s, _ = self._oracle_latent(
            Xs, Z, ls, vm, vc, whitened=(var_strat == "whitened"))
        exp_mean = mean_s.numpy().T @ W
        exp_var = var_s.numpy().T @ (W * W) + np.diag(Sigma_t)[None, :]
        np.testing.assert_allclose(np.asarray(pred.mean), exp_mean, atol=1e-9)
        np.testing.assert_allclose(np.asarray(pred.variance), exp_var,
                                   atol=1e-9)
