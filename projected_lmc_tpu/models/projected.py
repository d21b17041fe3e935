"""Projected LMC — the paper's model, TPU-native.

Counterpart of ``LMCMixingMatrix`` + ``ProjectedGPModel`` (projected_lmc.py:819-1155).
The model is q batch-independent exact latent GPs on *projected* data
T(Y) = R⁻¹Qᵀ Yᵀ, coupled by the mixing matrix H = QR: the O(p³)-coupled naive
LMC becomes q independent n×n problems (one TPU batched Cholesky) plus cheap
p×p projection algebra — the core speedup the rebuild preserves (SURVEY §3.2).

Mixing-matrix parametrizations:
  * bulk=True  — a single dense parameter H; Q/R recovered by jnp.linalg.qr on
    demand each step (reference: torch.linalg.qr at :866-872).
  * bulk=False — factored Q_plus (orthogonal) and R (upper-triangular or
    positive-diagonal). Orthogonality uses a trivialization
    Q_plus = Q₀ · expm(X − Xᵀ) (torch's ``orthogonal_map='matrix_exp'``) or the
    Cayley map; Q₀ is the SVD-initialized base (a frozen buffer).

Noise-coupling options mirror the reference exactly: BDN (block-diagonal
noise; else learn the cross-term M), and scalar_B / diagonal_B / full
Cholesky-parametrized B̃ for the discarded-noise factor.
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp
import numpy as np

from ..module import Module
from ..likelihoods import GaussianLikelihood, FixedTaskNoise
from ..distributions import MultitaskMultivariateNormal, SumKronRank1Cov
from ..ops.init_ops import init_lmc_coefficients
from ..ops.cholesky import safe_cholesky, solve_triangular
from ..constraints import (GreaterThan, scalar_param, positive_diagonal_param,
                           positive_diagonal_param_inverse,
                           upper_triangular_param,
                           upper_triangular_param_inverse,
                           lower_triangular_param)
from .exact import ExactGPModel, _canon_targets

_HIGHEST = jax.lax.Precision.HIGHEST


def _expm_skew(X):
    A = jnp.tril(X, -1)
    A = A - A.T
    return jax.scipy.linalg.expm(A)


def _cayley_skew(X):
    A = jnp.tril(X, -1)
    A = A - A.T
    n = A.shape[-1]
    eye = jnp.eye(n, dtype=X.dtype)
    return jnp.linalg.solve(eye - 0.5 * A, eye + 0.5 * A)


_ORTHO_MAPS = {"matrix_exp": _expm_skew, "cayley": _cayley_skew}


class LMCMixingMatrix(Module):
    """Parametrized mixing matrix H = Q·R (projected_lmc.py:819-890)."""

    _buffers_ = ("Q_base",)

    def __init__(self, Q_plus, R, bulk: bool = True, diagonal_R: bool = False,
                 ortho_param: str = "matrix_exp"):
        Q_plus = jnp.asarray(Q_plus)
        R = jnp.asarray(R)
        if Q_plus.shape[1] == Q_plus.shape[0]:
            self.mode = "Q_plus"
        elif Q_plus.shape[1] == R.shape[0]:
            self.mode = "Q"
        else:
            raise ValueError("Wrong dimensions for Q_plus: should be "
                             "n_tasks x n_tasks or n_tasks x n_latents")
        self.n_latents = int(R.shape[0])
        self.n_tasks = int(Q_plus.shape[0])
        self.bulk = bool(bulk)
        self.diagonal_R = bool(diagonal_R)
        self.ortho_param = str(ortho_param)
        dtype = Q_plus.dtype

        if bulk:
            if self.mode == "Q_plus":
                R_padded = jnp.eye(self.n_tasks, dtype=dtype)
                R_padded = R_padded.at[:self.n_latents, :self.n_latents].set(R)
                H = Q_plus @ R_padded
            else:
                H = Q_plus @ R
            self.H = H
        else:
            # trivialized orthogonal param: Q_plus = Q_base @ ortho_map(X)
            self.Q_base = Q_plus
            k = Q_plus.shape[1]
            self.ortho_raw = jnp.zeros((k, k), dtype)
            # R parametrization raw storage (exp on the diagonal), via the
            # right_inverse maps of constraints.py (torch parametrize parity,
            # projected_lmc.py:220-240)
            q = self.n_latents
            Rc = jnp.asarray(R).at[jnp.arange(q), jnp.arange(q)].set(
                jnp.clip(jnp.diagonal(R), 1e-12))
            if diagonal_R:
                self.R_raw = positive_diagonal_param_inverse(Rc)
            else:
                self.R_raw = upper_triangular_param_inverse(jnp.triu(Rc))

    # -- component accessors --------------------------------------------------
    def _Q_plus(self):
        if self.bulk:
            raise RuntimeError("bulk mode has no explicit Q_plus")
        return jnp.matmul(self.Q_base, _ORTHO_MAPS[self.ortho_param](self.ortho_raw),
                          precision=_HIGHEST)

    def _R(self):
        if self.diagonal_R:
            return positive_diagonal_param(self.R_raw)
        return upper_triangular_param(self.R_raw)

    def QR(self):
        """Returns (Q, R, Q_orth) — projected_lmc.py:864-875."""
        q = self.n_latents
        if self.bulk:
            # fp32-accurate QR: on TPU the default matmul precision is
            # bf16-grade passes, and this QR runs EVERY training step — the
            # bf16-grade orthogonality error (~1e-3) feeds Q⊥ straight into
            # the B̃ noise terms and was measured to cost the full-B̃ PLMC
            # its test R² over long horizons (0.938 vs 0.978 at 40k on the
            # default synthetic config; torch-fp64 oracle holds 0.980 —
            # results/plmc_trajectory_jax*.json, VERDICT r3 item 1).
            with jax.default_matmul_precision("highest"):
                Q_plus, R_padded = jnp.linalg.qr(self.H, mode="complete" if
                                                 self.mode == "Q_plus"
                                                 else "reduced")
            if self.mode == "Q_plus":
                Q, Q_orth = Q_plus[:, :q], Q_plus[:, q:]
                R = R_padded[:q, :q]
            else:
                Q, Q_orth, R = Q_plus, None, R_padded
            return Q, R, Q_orth
        Q_plus = self._Q_plus()
        if self.mode == "Q_plus":
            return Q_plus[:, :q], self._R(), Q_plus[:, q:]
        return Q_plus, self._R(), None

    def __call__(self):
        """H-transpose, (n_latents, n_tasks) — projected_lmc.py:877-884."""
        q = self.n_latents
        if self.bulk:
            if self.mode == "Q":
                return self.H.T
            return self.H[:, :q].T
        Q, R, _ = self.QR()
        return jnp.matmul(Q, R, precision=_HIGHEST).T

    def size(self, i=None):
        s = (self.n_latents, self.n_tasks)
        return s if i is None else s[i]

    def r_raw_diag_sum(self):
        """Σ log R_ii via the raw parametrization (non-bulk MLL term,
        projected_lmc.py:1237)."""
        return jnp.sum(jnp.diagonal(self.R_raw))


class ProjectedGPModel(ExactGPModel):
    """The projected LMC (projected_lmc.py:893-1155)."""

    _buffers_ = ("train_x", "train_y", "train_y_tasks", "Y_squared_norm")

    def __init__(self, train_x, train_y, n_tasks: int, n_latents: int,
                 proj_likelihood=None, init_lmc_coeffs: bool = True,
                 BDN: bool = True, diagonal_B: bool = False, scalar_B: bool = False,
                 diagonal_R: bool = False, mean_type="zero",
                 ortho_param: str = "matrix_exp", bulk: bool = True,
                 noise_thresh: float = -9.0, noise_init: float = 1e-2,
                 outputscales: bool = False, eps: float = 1e-3,
                 kernel_type="rbf", decomp=None, ker_kwargs=None,
                 n_inducing_points=None, seed: int = 0, **kwargs):
        train_x = jnp.asarray(train_x)
        if train_x.ndim == 1:
            train_x = train_x[:, None]
        dtype = train_x.dtype
        # host copy for the SVD init before the device conversion (avoids a
        # construction-time device->host fetch)
        train_y_host = np.asarray(train_y, dtype)
        train_y = jnp.asarray(train_y, dtype)
        n_data, p = train_y.shape
        if p != n_tasks:
            raise ValueError("train_y must be (n, n_tasks)")
        if mean_type not in ("zero", None) and not (
                isinstance(mean_type, str) and mean_type == "zero"):
            raise ValueError("Projected GP model does not support non-zero "
                             "output-wise means for now!")

        if proj_likelihood is None or proj_likelihood.batch != n_latents:
            proj_likelihood = GaussianLikelihood(
                batch_shape=n_latents,
                noise_constraint=GreaterThan(float(np.exp(noise_thresh))),
                dtype=dtype)

        super().__init__(train_x, jnp.zeros((n_latents, n_data), dtype),
                         proj_likelihood, n_tasks=n_latents, mean_type="zero",
                         outputscales=outputscales, kernel_type=kernel_type,
                         decomp=decomp, ker_kwargs=ker_kwargs,
                         n_inducing_points=n_inducing_points, seed=seed, **kwargs)
        self.train_y_tasks = train_y                         # (n, p) buffer

        # -- mixing matrix init (projected_lmc.py:931-970) -------------------
        if init_lmc_coeffs:
            if scalar_B and BDN:
                Q_plus, R_diag = init_lmc_coefficients(train_y_host,
                                                       n_latents=n_latents, QR_form=True)
                R = np.asarray(R_diag)
            else:
                Q_plus, R_padded = init_lmc_coefficients(train_y_host,
                                                         n_latents=p, QR_form=True)
                R = np.asarray(R_padded)[:n_latents]
        else:
            rng = np.random.default_rng(seed)
            fake = rng.standard_normal((p, n_latents))
            Q_plus, R_padded, _ = np.linalg.svd(fake, full_matrices=True)
            R = R_padded[:n_latents]
            if scalar_B and BDN:
                Q_plus = Q_plus[:, :n_latents]
        R = np.diag(np.asarray(R)) / np.sqrt(n_data - 1)
        self.lmc_coefficients = LMCMixingMatrix(
            jnp.asarray(np.asarray(Q_plus), dtype), jnp.asarray(R, dtype),
            bulk=bulk, diagonal_R=diagonal_R, ortho_param=ortho_param)

        # -- discarded-noise factor B̃ (projected_lmc.py:973-985) -------------
        self.noise_thresh = float(noise_thresh)
        if scalar_B:
            diagonal_B = True
            self.log_B_tilde_raw = jnp.full((p - n_latents,), math.log(noise_init), dtype)
            self.B_mode = "scalar"
            if BDN:
                self.Y_squared_norm = jnp.sum(train_y**2)    # PLMC_fast buffer (:978)
        elif diagonal_B:
            self.log_B_tilde_raw = jnp.asarray(
                GreaterThan(noise_thresh).inverse(
                    jnp.full((p - n_latents,), math.log(noise_init))), dtype)
            self.B_mode = "diagonal"
        else:
            self.B_tilde_inv_chol_raw = jnp.asarray(
                np.diag(np.full(p - n_latents, math.log(1.0 / noise_init))), dtype)
            self.B_mode = "full"
        self.diagonal_B, self.scalar_B, self.BDN = bool(diagonal_B), bool(scalar_B), bool(BDN)

        if not BDN:
            self.M = jnp.zeros((n_latents, p - n_latents), dtype)

        self.n_tasks = int(p)          # note: ExactGPModel's batch is n_latents
        self.n_latents = int(n_latents)
        self.latent_dim = -1
        self.eps = float(eps)

    # -- parametrized noise components ----------------------------------------
    @property
    def log_B_tilde(self):
        """(p−q,) log of the diagonal of B̃ under the active parametrization."""
        if self.B_mode == "scalar":
            # ScalarParam with clamp bounds (noise_thresh, -noise_thresh) (:976)
            if self.log_B_tilde_raw.size == 0:
                return self.log_B_tilde_raw
            return scalar_param(self.log_B_tilde_raw,
                                (self.noise_thresh, -self.noise_thresh))
        if self.B_mode == "diagonal":
            return GreaterThan(self.noise_thresh).forward(self.log_B_tilde_raw)
        raise AttributeError("log_B_tilde undefined for full B̃ parametrization")

    @property
    def B_tilde_inv_chol(self):
        """Lower-triangular factor of B̃⁻¹ (full mode, :983-984)."""
        return lower_triangular_param(self.B_tilde_inv_chol_raw,
                                      (self.noise_thresh, -self.noise_thresh))

    def projected_noise(self):
        """σ_P, size q (projected_lmc.py:996-1000)."""
        return self.likelihood.noise[..., 0]

    def B_tilde(self):
        """Discarded-noise factor B̃, (p−q, p−q) (projected_lmc.py:1076-1086)."""
        if self.diagonal_B:
            return jnp.diag(jnp.exp(self.log_B_tilde))
        L = self.B_tilde_inv_chol
        k = L.shape[-1]
        L_inv = solve_triangular(L, jnp.eye(k, dtype=L.dtype), lower=True)
        return jnp.matmul(L_inv.T, L_inv, precision=_HIGHEST)

    # -- projection algebra ------------------------------------------------------
    def projection_matrix(self):
        """T = Q R⁻ᵀ (+ Q⊥ Mᵀ Σ_P correction), (p, q) (projected_lmc.py:1003-1012)."""
        Q, R, Q_orth = self.lmc_coefficients.QR()
        # T = Q R⁻ᵀ so that Y @ T == project_data(Y).T == (R⁻¹QᵀYᵀ)ᵀ and
        # H @ T == (QR)ᵀ... i.e. Tᵀ H ᵀ = R⁻¹QᵀQR = I_q for any upper R.
        H_pinv = solve_triangular(R, Q.T, lower=False).T
        if not self.BDN:
            return H_pinv + jnp.matmul(Q_orth, self.M.T, precision=_HIGHEST) \
                * self.projected_noise()[None, :]
        return H_pinv

    def project_data(self, data):
        """(q, n) projected data R⁻¹Qᵀ Yᵀ (+ cross term) (projected_lmc.py:1014-1021)."""
        Q, R, Q_orth = self.lmc_coefficients.QR()
        unscaled = jnp.matmul(Q.T, data.T, precision=_HIGHEST)
        proj = solve_triangular(R, unscaled, lower=False)
        if not self.BDN:
            cross = jnp.matmul(self.M, jnp.matmul(Q_orth.T, data.T, precision=_HIGHEST),
                               precision=_HIGHEST)
            proj = proj + self.projected_noise()[:, None] * cross
        return proj

    def full_likelihood(self, differentiable: bool = False) -> FixedTaskNoise:
        """Reconstructs the p×p task noise Σ = (QR)Σ_P(QR)ᵀ + Q⊥B̃Q⊥ᵀ + cross
        terms, Cholesky-factorized with the escalating-jitter ladder
        (projected_lmc.py:1023-1074).

        CONTRACT: by default the returned factor is wrapped in
        ``stop_gradient`` — this matches the reference, which only ever calls
        full_likelihood in eval mode (experiments.py:316); noise parameters
        are trained through ProjectedLMCmll, not through this reconstruction.
        Pass ``differentiable=True`` if you intend to optimize through
        ``predict(observed=True)`` — otherwise the noise would silently stop
        learning."""
        Q, R, Q_orth = self.lmc_coefficients.QR()
        QR = jnp.matmul(Q, R, precision=_HIGHEST)
        sigma_p = self.projected_noise()
        p, q = self.n_tasks, self.n_latents
        if not self.BDN:
            if self.diagonal_B:
                B_tilde = jnp.diag(jnp.exp(self.log_B_tilde))
            else:
                B_tilde = self.B_tilde()
            B_term = Q_orth @ B_tilde @ Q_orth.T
            M_term = -QR @ (sigma_p[:, None] * self.M) @ B_tilde @ Q_orth.T
            D_rot = jnp.diag(sigma_p) + (sigma_p[:, None] * self.M) @ B_tilde \
                @ (self.M.T * sigma_p[None, :])
            D_term = QR @ D_rot @ QR.T
            Sigma = D_term + M_term + M_term.T + B_term
        else:
            if self.scalar_B:
                if self.log_B_tilde_raw.size > 0:
                    B_term = jnp.exp(self.log_B_tilde[0]) * (
                        jnp.eye(p, dtype=QR.dtype) - Q @ Q.T)
                else:
                    B_term = jnp.zeros((p, p), QR.dtype)
            elif self.diagonal_B:
                root = Q_orth @ jnp.diag(jnp.exp(self.log_B_tilde / 2))
                B_term = root @ root.T
            else:
                k = p - q
                Binv_chol = self.B_tilde_inv_chol
                B_root = solve_triangular(Binv_chol, jnp.eye(k, dtype=QR.dtype),
                                          lower=True).T
                root = Q_orth @ B_root
                B_term = root @ root.T
            D_root = QR * jnp.sqrt(sigma_p)[None, :]
            Sigma = D_root @ D_root.T + B_term
        chol = safe_cholesky(Sigma + 1e-6 * jnp.eye(p, dtype=Sigma.dtype))
        if not differentiable:
            chol = jax.lax.stop_gradient(chol)
        return FixedTaskNoise(chol)

    # -- latent / task posteriors ----------------------------------------------
    def prediction_cache(self):
        """Factorize the training system once for repeated posterior queries.

        The functional analog of gpytorch's prediction-strategy cache (built
        lazily on the first eval-mode call, projected_lmc.py:1133 +
        exact_prediction_strategies): project the stored task targets and
        factorize K+Σ_P (or the SGPR capacitance) once. Pass the returned
        pytree as ``cache=`` to :meth:`predict` / :meth:`compute_latent_distrib`
        to amortize the O(q·n³) (or O(q·n·m²)) setup across serving batches —
        per-batch work is then only the n*×(n|m) cross-covariance and solves.
        """
        proj = self.project_data(self.train_y_tasks)
        return self.precompute_posterior(targets=proj, orientation="tn")

    def compute_latent_distrib(self, x, full_cov: bool = True, cache=None):
        """Batched latent posterior at x, re-targeting the cached exact GP to the
        projected data (projected_lmc.py:1093-1106 set_train_data trick)."""
        if cache is None:
            cache = self.prediction_cache()
        return self.posterior(x, cache=cache, full_cov=full_cov)

    def latent_prior(self, x):
        """Training-mode forward: batched latent prior (projected_lmc.py:1130-1131)."""
        return self.prior(x)

    def compute_loo(self):
        """LOO in latent space (projected_lmc.py:1108-1119); returns (n, q)."""
        proj = self.project_data(self.train_y_tasks)
        return super().compute_loo(targets=proj, orientation="tn")

    def __call__(self, x, observed: bool = False, full_cov: bool = False):
        """Eval-mode full posterior: latent posterior mixed up to tasks,
        covar Σ_b kron(K_b, h_b h_bᵀ) (projected_lmc.py:1121-1155)."""
        latent = self.compute_latent_distrib(x, full_cov=True)
        H = self.lmc_coefficients()                      # (q, p)
        mean = jnp.matmul(latent.mean.T, H, precision=_HIGHEST)   # (n*, p)
        covar = SumKronRank1Cov(latent.covariance_matrix, H.T,
                                None if not observed else
                                self.full_likelihood().task_covariance())
        return MultitaskMultivariateNormal(mean, covar)

    def predict(self, x, observed: bool = True, cache=None):
        """Convenience: (mean, variance) at x with observation noise
        (the 'full_likelihood(model(X_test))' path of experiments.py:316-330).
        Pass ``cache=model.prediction_cache()`` to amortize the training-system
        factorization across repeated serving calls."""
        latent = self.compute_latent_distrib(x, full_cov=False, cache=cache)
        H = self.lmc_coefficients()
        mean = jnp.matmul(latent.mean.T, H, precision=_HIGHEST)
        var = jnp.matmul(latent.variance.T, H * H, precision=_HIGHEST)
        if observed:
            Sigma = self.full_likelihood().task_covariance()
            var = var + jnp.diagonal(Sigma)[None, :]
        return mean, var
