"""Variational multitask (LMC) GP — whitened SVGP over q shared-inducing latents.

TPU-native counterpart of ``VariationalMultitaskGPModel`` +
``CustomLMCVariationalStrategy`` (projected_lmc.py:659-813). gpytorch's
variational-strategy object graph collapses here to explicit batched math:

  whitened (default):   q(f_b) = N(A_b m_b, K_b − A_b A_bᵀ + A_b S_b A_bᵀ),
                        A_b = K_xz,b L_zz,b⁻ᵀ,  KL = KL(N(m,S) ‖ N(0,I))
  unwhitened (``var_strat="unwhitened"``, reference :696,738; forced when
                        train_ind_ratio == 1 with inducing fixed at the
                        training inputs, :724-729): q(u) in function space,
                        KL = KL(N(m,S) ‖ N(0,K_zz))

Inducing points are **shared across latents** and initialized by scrambled
LatinHypercube in [−1,1] with n_ind = floor(n/train_ind_ratio)
(projected_lmc.py:732-734; the README says Sobol' — the code uses LHC, which we
match). Deterministic means live on *tasks*, not latents
(CustomLMCVariationalStrategy, :672-683); latent means are zero (:752).
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp
import numpy as np

from ..module import Module
from ..kernels import handle_covar, KERNEL_REGISTRY
from ..means import MEAN_REGISTRY
from ..likelihoods import MultitaskGaussianLikelihood
from ..ops.init_ops import init_lmc_coefficients, latin_hypercube, sobol
from ..ops.cholesky import safe_cholesky, solve_triangular, cho_solve, logdet_from_chol
from .exact import _resolve
from .multitask import _MeanVarMT

_HIGHEST = jax.lax.Precision.HIGHEST


class VariationalMultitaskGPModel(Module):
    """SVGP LMC with CholeskyVariationalDistribution over batch q latents."""

    _buffers_ = ("train_x", "train_y")

    def __init__(self, train_x, n_latents: int, n_tasks: int = None,
                 train_ind_ratio: float = 1.5, seed: int = 0,
                 init_lmc_coeffs: bool = False, train_y=None,
                 prior_scales=None, prior_width=None, mean_type="constant",
                 kernel_type="rbf", outputscales: bool = False, decomp=None,
                 likelihood: MultitaskGaussianLikelihood = None,
                 ker_kwargs=None, distrib: str = "cholesky",
                 var_strat: str = "default",
                 ind_point_method: str = "lhc",
                 ind_point_range=None, **kwargs):
        train_x = jnp.asarray(train_x)
        if train_x.ndim == 1:
            train_x = train_x[:, None]
        dtype = train_x.dtype
        self.train_x = train_x
        self.dim = int(train_x.shape[1])
        n = train_x.shape[0]

        if train_y is not None:
            # host copy for the SVD init (avoids a construction-time
            # device->host fetch)
            train_y_host = np.asarray(train_y, dtype)
            train_y = jnp.asarray(train_y, dtype)
            if n_tasks is None or train_y.shape[1] != n_tasks:
                n_tasks = train_y.shape[1]
        self.train_y = train_y
        self.n_tasks, self.n_latents = int(n_tasks), int(n_latents)

        # Strategy choice (projected_lmc.py:696,738 ``var_strat``): the
        # reference takes the gpytorch strategy class; here it is a string —
        # "whitened" (VariationalStrategy, the reference default),
        # "unwhitened" (UnwhitenedVariationalStrategy), or "default" which
        # resolves to whitened unless train_ind_ratio == 1 (the reference
        # forces unwhitened there, :728, for compatibility).
        if var_strat not in ("default", "whitened", "unwhitened"):
            raise ValueError(f"unknown variational strategy {var_strat!r}")
        ratio_one = float(train_ind_ratio) == 1.0
        self.whitened = (not ratio_one if var_strat == "default"
                         else var_strat == "whitened")
        if ratio_one:
            # inducing fixed at train inputs, unwhitened strategy + Cholesky
            # distribution forced (:724-729)
            self.whitened = False
            inducing = train_x
            self._frozen_params_ = ("inducing_points",)
            distrib = "cholesky"
        else:
            n_ind = int(np.floor(n / float(train_ind_ratio)))
            qmc = sobol if ind_point_method == "sobol" else latin_hypercube
            # QMC box: the reference hard-codes [-1,1]^d (projected_lmc.py:
            # 732-734 — its synthetic inputs live there). ``ind_point_range=
            # "data"`` scales the box to the per-dimension training-input
            # range instead (real datasets are rarely in [-1,1]; half the
            # inducing points would start outside the data support), or pass
            # an explicit (lo, hi) pair of length-d arrays.
            u = qmc(n_ind, self.dim, seed=seed)            # in [0, 1]^d
            if ind_point_range is None:
                lo, hi = -1.0, 1.0
            elif ind_point_range == "data":
                xh = np.asarray(train_x)
                lo, hi = xh.min(axis=0), xh.max(axis=0)
            else:
                lo, hi = ind_point_range
                lo, hi = np.asarray(lo, np.float64), np.asarray(hi, np.float64)
            inducing = jnp.asarray(lo + (hi - lo) * u, dtype)
        self.inducing_points = inducing
        m = inducing.shape[0]

        # Variational distribution q(u_b) (projected_lmc.py:737 ``distrib``):
        #   cholesky    — full covariance via a lower-tri factor (the only
        #                 class the reference ever passes);
        #   mean_field  — diagonal covariance;
        #   delta       — point estimate (MAP), no covariance parameters.
        # mean 0; covariance initialized at the prior — I for the whitened
        # strategy, chol(K_zz) for the unwhitened one (gpytorch's
        # initialize_variational_distribution).
        if distrib not in ("cholesky", "mean_field", "delta"):
            raise ValueError(f"unknown variational distribution {distrib!r}")
        self.distrib = str(distrib)
        self.var_mean = jnp.zeros((n_latents, m), dtype)
        if distrib == "cholesky":
            self.var_chol = jnp.broadcast_to(jnp.eye(m, dtype=dtype),
                                             (n_latents, m, m)).copy()
        elif distrib == "mean_field":
            self.var_chol_diag = jnp.ones((n_latents, m), dtype)

        self.covar_module = handle_covar(
            _resolve(KERNEL_REGISTRY, kernel_type, "rbf"), dim=self.dim,
            decomp=decomp, prior_scales=prior_scales, prior_width=prior_width,
            outputscales=outputscales, n_funcs=n_latents,
            ker_kwargs=ker_kwargs, dtype=dtype)

        # task-level deterministic means (CustomLMCVariationalStrategy)
        mean_cls = _resolve(MEAN_REGISTRY, mean_type, "constant")
        self.output_mean_module = mean_cls(input_size=self.dim,
                                           batch_shape=n_tasks, dtype=dtype, seed=seed)

        if likelihood is None:
            likelihood = MultitaskGaussianLikelihood(num_tasks=n_tasks, rank=0,
                                                     seed=seed, dtype=dtype)
        self.likelihood = likelihood

        if init_lmc_coeffs and train_y is not None:
            coeffs = np.asarray(init_lmc_coefficients(train_y_host, n_latents))
            self.lmc_coeffs = jnp.asarray(coeffs, dtype)        # (q, T)
        else:
            rng = np.random.default_rng(seed)
            self.lmc_coeffs = jnp.asarray(
                rng.standard_normal((n_latents, n_tasks)), dtype)

        if not self.whitened and self.distrib != "delta":
            # unwhitened prior is N(0, K_zz): start q(u) at the prior
            # (host-side escalating-jitter Cholesky for the one-time init;
            # starts at the runtime prior jitter of _kernel_factors so that
            # S == K_zz + jitter·I exactly and the initial KL is zero)
            Kzz = np.asarray(self.covar_module(inducing), np.float64)
            if self.distrib == "mean_field":
                self.var_chol_diag = jnp.asarray(
                    np.sqrt(np.clip(np.diagonal(Kzz, axis1=-2, axis2=-1),
                                    1e-12, None)), dtype)
            else:
                jitter = 1e-6
                while True:
                    try:
                        chol = np.linalg.cholesky(Kzz + jitter * np.eye(m))
                        break
                    except np.linalg.LinAlgError:
                        jitter *= 10
                        if jitter > 1e2:
                            raise
                self.var_chol = jnp.asarray(chol, dtype)

    def lmc_coefficients(self):
        return np.asarray(self.lmc_coeffs)

    def sgpr_warm_start(self, noise=None, jitter: float = 1e-6):
        """Warm-start q(u) at the closed-form SGPR-optimal distribution.

        At the standard init (whitened m=0, S=I) the ELBO is *stationary* in
        every parameter that enters only through the inducing interpolant —
        K_xz K_zz^{-1} cancels out of the marginal variance when S == prior —
        so on hard targets (e.g. an oscillatory tidal series) gradient descent
        can reach the collapsed optimum (H → 0, likelihood noise = Var(Y))
        before the variational mean fits anything. gpytorch shares this init
        and pathology (the reference never trains its variational model on
        real data). For a Gaussian likelihood the optimal q(u) given the
        current kernel is available in closed form (Titsias 2009):
        with per-latent targets ỹ_b = Y H_b^+ (the SVD-initialized mixing
        matrix's least-squares inverse),

            Σ_b = K_zz + σ⁻² K_zx K_xz,
            m*_b = σ⁻² K_zz Σ_b^{-1} K_zx ỹ_b,   S*_b = K_zz Σ_b^{-1} K_zz.

        Call AFTER any data-driven kernel initialization (e.g. the spectral-
        mixture ``initialize_from_data``) — the warm start conditions on the
        current kernel. One-time host-side O(q·(m³ + m²n)) numpy; returns a
        new model (pytree modules are immutable).
        """
        if self.train_y is None:
            raise ValueError("sgpr_warm_start requires train_y")
        m = self.inducing_points.shape[0]
        H = np.asarray(self.lmc_coeffs, np.float64)             # (q, p)
        Y = np.asarray(self.train_y, np.float64)                # (n, p)
        # latent targets: minimum-norm solve of H^T L = Y^T  -> (q, n)
        L_t, *_ = np.linalg.lstsq(H.T, Y.T, rcond=None)
        if noise is None:
            # mean diagonal of the FULL task covariance (works for every
            # likelihood rank, and includes the global noise term the ELBO
            # actually uses — ``task_noises`` exists only for rank=0)
            noise = float(np.mean(np.diag(
                np.asarray(self.likelihood.task_covariance(), np.float64))))
        z = self.inducing_points
        Kzz = np.asarray(self.covar_module(z), np.float64)      # (q, m, m)
        Kzx = np.asarray(self.covar_module(z, self.train_x), np.float64)
        eye = np.eye(m)
        # whitening factor: the SAME one prediction/ELBO use at runtime
        # (_kernel_factors' safe_cholesky of Kzz + 1e-6 I) — a private ladder
        # here could settle on a different jitter on near-singular
        # spectral-mixture K_zz, leaving m/S whitened against a different
        # factor than the one applied at runtime
        Lzz_rt = np.asarray(self._kernel_factors(), np.float64)  # (q, m, m)

        def chol_ladder(A, j0=jitter):
            # oscillatory kernels (spectral mixture) give near-singular K_zz
            # at QMC inducing sets — escalate like the init path above
            j = j0
            while True:
                try:
                    return np.linalg.cholesky(A + j * eye), j
                except np.linalg.LinAlgError:
                    j *= 10
                    if j > 1e2 * max(1.0, float(np.abs(A).max())):
                        raise

        var_mean = np.zeros((self.n_latents, m))
        S_chols = np.zeros((self.n_latents, m, m))
        for b in range(self.n_latents):
            _, jb = chol_ladder(Kzz[b])
            Kb = Kzz[b] + jb * eye
            Lzz = Lzz_rt[b]
            Sig = Kb + (Kzx[b] @ Kzx[b].T) / noise
            m_u = Kb @ np.linalg.solve(Sig, Kzx[b] @ L_t[b]) / noise  # (m,)
            S_u = Kb @ np.linalg.solve(Sig, Kb)
            S_u = 0.5 * (S_u + S_u.T)
            if self.whitened:
                from scipy.linalg import solve_triangular as st
                m_w = st(Lzz, m_u, lower=True)
                S_w = st(Lzz, st(Lzz, S_u, lower=True).T, lower=True)
                S_b = 0.5 * (S_w + S_w.T)
                var_mean[b] = m_w
            else:
                var_mean[b], S_b = m_u, S_u
            S_chols[b] = chol_ladder(S_b)[0]
        dtype = self.inducing_points.dtype
        out = self.replace(var_mean=jnp.asarray(var_mean, dtype))
        if self.distrib == "cholesky":
            out = out.replace(var_chol=jnp.asarray(S_chols, dtype))
        elif self.distrib == "mean_field":
            diag = np.sqrt(np.clip(np.einsum("qij,qij->qi", S_chols, S_chols),
                                   1e-12, None))
            out = out.replace(var_chol_diag=jnp.asarray(diag, dtype))
        return out

    def noise_mstep(self, floor: float = 1e-4):
        """Exact ELBO coordinate maximization over the multitask noise Σt
        given the current q(u) — the M-step companion to
        :meth:`sgpr_warm_start`'s E-step.

        The expected log-likelihood term (see :meth:`elbo`) is
        −½[tr(Σt⁻¹ C) + n·logdet Σt] + const with
        C = ΔᵀΔ + Wᵀ diag(Σₙ var_l) W, so the maximizer is Σt* = C/n in
        closed form. Σt* is then projected onto the likelihood's
        parametrization: for rank r > 0, probabilistic-PCA style —
        σ²_global = mean of the p−r trailing eigenvalues,
        F = V_r·√(λ_r − σ²); for rank 0, per-task diagonal with the global
        σ² at ``floor``.

        Why this is needed (results/realdata_study_tidal_var.csv round 3):
        the warm start optimizes q(u) at the INITIAL likelihood noise, so
        the shipped predictive σ was the init's (mean_sigma 1.20 vs RMSE
        0.35, PVA −2.61, alpha_CI 1.000). One closed-form M-step
        recalibrates it against the train residuals + posterior variance.
        Returns a new model; alternate with the E-step via :meth:`sgpr_em`.
        """
        if self.train_y is None:
            raise ValueError("noise_mstep requires train_y")
        X = self.train_x
        Y = np.asarray(self.train_y, np.float64)
        n = Y.shape[0]
        mean_l, var_l = self.compute_latent_distrib(X, full_cov=False)
        W = np.asarray(self.lmc_coeffs, np.float64)             # (q, T)
        M = np.asarray(mean_l, np.float64).T @ W \
            + np.asarray(self.output_mean_module(X), np.float64).T
        delta = Y - M                                           # (n, T)
        vsum = np.asarray(var_l, np.float64).sum(axis=1)        # (q,)
        S = (delta.T @ delta + (W.T * vsum) @ W) / n            # (T, T)
        S = 0.5 * (S + S.T)

        lik = self.likelihood
        p = lik.num_tasks
        if lik.rank > 0:
            lam, V = np.linalg.eigh(S)                          # ascending
            lam = np.maximum(lam[::-1], 0.0)
            V = V[:, ::-1]
            r = min(lik.rank, p - 1) if p > 1 else lik.rank
            sigma2 = max(float(lam[r:].mean()) if r < p else floor, floor)
            F = V[:, :lik.rank] * np.sqrt(
                np.maximum(lam[:lik.rank] - sigma2, 0.0))[None, :]
            dt = lik.task_noise_covar_factor.dtype
            new_lik = lik.replace(
                task_noise_covar_factor=jnp.asarray(F, dt))
            if lik.has_global_noise:
                new_lik = new_lik.set_noise(sigma2)
        else:
            diag = np.maximum(np.diag(S), floor)
            sigma2 = floor if lik.has_task_noise else \
                max(float(diag.mean()), floor)
            new_lik = lik
            if lik.has_global_noise:
                new_lik = new_lik.set_noise(sigma2)
            if lik.has_task_noise:
                dt = lik.raw_task_noises.dtype
                new_lik = new_lik.replace(
                    raw_task_noises=lik.constraint.inverse(
                        jnp.asarray(np.maximum(diag - sigma2, floor), dt)))
        return self.replace(likelihood=new_lik)

    def sgpr_em(self, n_steps: int = 3, jitter: float = 1e-6,
                floor: float = 1e-4):
        """Alternate the closed-form SGPR E-step (:meth:`sgpr_warm_start`,
        optimal q(u) at the current noise) and the exact noise M-step
        (:meth:`noise_mstep`) — coordinate ascent on the ELBO with no
        gradient steps, each coordinate update exact. Ends on the M-step so
        the shipped σ explains exactly what the shipped q(u) leaves
        unexplained (ending on an E-step re-tightens the fit under the new
        noise and leaves σ over-wide — the round-3 tidal miscalibration in
        miniature). A few rounds approach the coordinate-ascent fixed
        point, where PVA ≈ 0 on train by construction."""
        m = self
        for _ in range(max(int(n_steps), 1)):
            m = m.sgpr_warm_start(jitter=jitter)
            m = m.noise_mstep(floor=floor)
        return m

    # -- variational machinery ---------------------------------------------------
    def _S_chol(self):
        """(q, m, m) lower factor of the variational covariance S, or None for
        the delta (point-estimate) distribution."""
        if self.distrib == "cholesky":
            return jnp.tril(self.var_chol)
        if self.distrib == "mean_field":
            return jax.vmap(jnp.diag)(self.var_chol_diag)
        return None

    def _kernel_factors(self):
        z = self.inducing_points
        Kzz = self.covar_module(z)
        m = Kzz.shape[-1]
        Lzz = safe_cholesky(Kzz + 1e-6 * jnp.eye(m, dtype=Kzz.dtype))
        return Lzz

    def compute_latent_distrib(self, x, full_cov: bool = False,
                               prior: bool = False):
        """Batched latent posterior q(f_b(x)): returns (mean (q,n), var (q,n))
        or (mean, cov (q,n,n)) (projected_lmc.py:812-813). ``prior=True``
        returns the latent prior at x instead (the reference forwards the flag
        to the variational strategy, which short-circuits to model.forward)."""
        # normalize 1-D inputs the way the kernel does (x[:, None]):
        # atleast_2d would read a length-n series as ONE n-dimensional point
        x = jnp.asarray(x)
        if x.ndim == 1:
            x = x[:, None]
        if prior:
            n = x.shape[0]
            mean = jnp.zeros((self.n_latents, n), self.inducing_points.dtype)
            if full_cov:
                return mean, self.covar_module(x)
            return mean, jnp.clip(self.covar_module(x, diag=True), min=1e-12)
        Lzz = self._kernel_factors()
        Kxz = self.covar_module(x, self.inducing_points)        # (q, n, m)
        S_chol = self._S_chol()
        if self.whitened:
            A = jnp.swapaxes(solve_triangular(Lzz, jnp.swapaxes(Kxz, -1, -2),
                                              lower=True), -1, -2)  # (q, n, m)
            mean = jnp.matmul(A, self.var_mean[..., None], precision=_HIGHEST)[..., 0]
            AS = None if S_chol is None else jnp.matmul(A, S_chol,
                                                        precision=_HIGHEST)
            if full_cov:
                Kxx = self.covar_module(x)
                cov = Kxx - jnp.matmul(A, jnp.swapaxes(A, -1, -2), precision=_HIGHEST)
                if AS is not None:
                    cov = cov + jnp.matmul(AS, jnp.swapaxes(AS, -1, -2),
                                           precision=_HIGHEST)
                return mean, cov
            kdiag = self.covar_module(x, diag=True)
            var = kdiag - jnp.sum(A * A, axis=-1)
            if AS is not None:
                var = var + jnp.sum(AS * AS, axis=-1)
            return mean, jnp.clip(var, min=1e-12)
        # unwhitened: interp = K_xz K_zz^{-1}
        interp = jnp.swapaxes(cho_solve(Lzz, jnp.swapaxes(Kxz, -1, -2)), -1, -2)
        mean = jnp.matmul(interp, self.var_mean[..., None], precision=_HIGHEST)[..., 0]
        # delta distribution: S = 0, so the +interp S interpᵀ term vanishes
        IS = None if S_chol is None else jnp.matmul(interp, S_chol,
                                                    precision=_HIGHEST)
        # cov = Kxx − interp (Kzz − S) interpᵀ = Kxx − (interp Lzz)(interp Lzz)ᵀ + IS ISᵀ
        ILz = jnp.matmul(interp, Lzz, precision=_HIGHEST)
        if full_cov:
            Kxx = self.covar_module(x)
            cov = Kxx - jnp.matmul(ILz, jnp.swapaxes(ILz, -1, -2), precision=_HIGHEST)
            if IS is not None:
                cov = cov + jnp.matmul(IS, jnp.swapaxes(IS, -1, -2),
                                       precision=_HIGHEST)
            return mean, cov
        kdiag = self.covar_module(x, diag=True)
        var = kdiag - jnp.sum(ILz * ILz, axis=-1)
        if IS is not None:
            var = var + jnp.sum(IS * IS, axis=-1)
        return mean, jnp.clip(var, min=1e-12)

    def kl_divergence(self):
        """Σ_b KL(q(u_b) ‖ p(u_b)); whitened prior is N(0, I)."""
        S_chol = self._S_chol()
        m = self.var_mean.shape[-1]
        if S_chol is None:
            # delta distribution: KL(δ_m ‖ p) := −log p(m) (gpytorch's
            # MAP convention); prior is N(0, I) whitened, N(0, K_zz) not
            if self.whitened:
                quad = jnp.sum(self.var_mean * self.var_mean, axis=-1)
                return jnp.sum(0.5 * (quad + m * math.log(2 * math.pi)))
            Lzz = self._kernel_factors()
            w = solve_triangular(Lzz, self.var_mean[..., None],
                                 lower=True)[..., 0]
            quad = jnp.sum(w * w, axis=-1)
            logdet_K = logdet_from_chol(Lzz)
            return jnp.sum(0.5 * (quad + logdet_K + m * math.log(2 * math.pi)))
        diag = jnp.diagonal(S_chol, axis1=-2, axis2=-1)
        logdet_S = jnp.sum(jnp.log(diag * diag), axis=-1)
        if self.whitened:
            tr = jnp.sum(S_chol * S_chol, axis=(-2, -1))
            quad = jnp.sum(self.var_mean * self.var_mean, axis=-1)
            kl = 0.5 * (tr + quad - m - logdet_S)
            return jnp.sum(kl)
        Lzz = self._kernel_factors()
        iL_S = solve_triangular(Lzz, S_chol, lower=True)
        tr = jnp.sum(iL_S * iL_S, axis=(-2, -1))
        w = solve_triangular(Lzz, self.var_mean[..., None], lower=True)[..., 0]
        quad = jnp.sum(w * w, axis=-1)
        logdet_K = logdet_from_chol(Lzz)
        kl = 0.5 * (tr + quad - m + logdet_K - logdet_S)
        return jnp.sum(kl)

    # -- task-level predictions -----------------------------------------------------
    def __call__(self, x, observed: bool = False):
        """Task-level posterior mean/variance (LMC mixing + task means)."""
        mean_l, var_l = self.compute_latent_distrib(x, full_cov=False)
        W = self.lmc_coeffs                                     # (q, T)
        mean = jnp.matmul(mean_l.T, W, precision=_HIGHEST) \
            + self.output_mean_module(x).T                      # (n, T)
        var = jnp.matmul(var_l.T, W * W, precision=_HIGHEST)
        if observed:
            var = var + jnp.diagonal(self.likelihood.task_covariance())[None, :]
        return _MeanVarMT(mean, var)

    def elbo(self, x=None, y=None, num_data: int = None):
        """VariationalELBO (gpytorch semantics): E_q[log p(y|f)]/num_data −
        KL/num_data, with the expected log-likelihood under the multitask
        Gaussian noise Σt computed in closed form."""
        x = self.train_x if x is None else x
        y = self.train_y if y is None else jnp.asarray(y)
        n = x.shape[0]
        num_data = n if num_data is None else num_data

        mean_l, var_l = self.compute_latent_distrib(x, full_cov=False)
        W = self.lmc_coeffs                                     # (q, T)
        mean = jnp.matmul(mean_l.T, W, precision=_HIGHEST) \
            + self.output_mean_module(x).T
        delta = y - mean                                        # (n, T)

        Sigma_t = self.likelihood.task_covariance()
        Rt = safe_cholesky(Sigma_t)
        z = solve_triangular(Rt, delta.T, lower=True)           # (T, n)
        quad = jnp.sum(z * z)
        logdet = logdet_from_chol(Rt)
        T = Sigma_t.shape[-1]
        # trace term: Σ_n Σ_b var_b(x_n) (W Σt^{-1} Wᵀ)_{bb}
        SinvW = cho_solve(Rt, W.T)                              # (T, q)
        wsw_diag = jnp.sum(W.T * SinvW, axis=0)                 # (q,)
        trace = jnp.sum(var_l * wsw_diag[:, None])
        exp_ll = -0.5 * (quad + trace + n * (logdet + T * math.log(2 * math.pi)))

        kl = self.kl_divergence()
        prior = self.covar_module.prior_log_prob()
        return (exp_ll - kl + prior) / num_data

    # -- introspection ---------------------------------------------------------------
    def lscales(self, unpacked: bool = True):
        cm = self.covar_module
        if hasattr(cm, "kernels"):
            return [np.squeeze(np.asarray(k.lengthscale)) for k in cm.kernels]
        scales = np.squeeze(np.asarray(cm.lengthscale))
        return scales if unpacked else [scales]

    def outputscale(self, unpacked: bool = False):
        cm = self.covar_module
        if hasattr(cm, "kernels"):
            res = np.stack([np.asarray(k.outputscale) for k in cm.kernels], axis=1)
        elif hasattr(cm, "outputscale"):
            res = np.asarray(cm.outputscale)[:, None]
        else:
            res = np.ones((self.n_latents, 1))
        return res.squeeze() if unpacked else res
