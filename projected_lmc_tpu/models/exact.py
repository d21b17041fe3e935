"""Exact GP regression model (batched over independent tasks / latents).

TPU-native counterpart of ``ExactGPModel`` (projected_lmc.py:264-436). The
gpytorch version mutates train/eval mode and caches a prediction strategy; here
the model is a pure pytree and the posterior factorization is an explicit,
reusable cache returned by :meth:`precompute_posterior` — the jit-friendly
version of gpytorch's ``prediction_strategy``.

Batched multitask: ``n_tasks`` batch-independent single-output GPs evaluated as
one batched Cholesky (the batch dimension maps directly onto TPU batched
linear-algebra ops). With ``n_inducing_points`` the model switches to the
Titsias SGPR low-rank path (reference: InducingPointKernel, projected_lmc.py:302-303),
whose MLL adds the −tr(K−Q)/2σ² correction and whose solves are m×m Woodbury
capacitance factorizations instead of n×n Choleskys.
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp
import numpy as np

from ..module import Module, CacheTag
from ..kernels import handle_covar, KERNEL_REGISTRY, Kernel
from ..means import MEAN_REGISTRY, Mean, ConstantMean
from ..likelihoods import GaussianLikelihood
from ..distributions import MultivariateNormal, MultitaskMultivariateNormal
from ..ops.cholesky import (safe_cholesky, solve_triangular, cho_solve,
                            logdet_from_chol, chol_inverse_diag)

_HIGHEST = jax.lax.Precision.HIGHEST


def _canon_targets(train_y, n_tasks, orientation: str = "auto"):
    """Accepts (n,), (n, T) or (T, n); stores (T, n).

    ``orientation`` resolves the square-input ambiguity (n == n_tasks):
    "tn" asserts the input is already (T, n) (internal callers passing
    projected (q, n) targets), "nt" asserts (n, T); "auto" infers by shape
    and treats a square input as (n, T) — the user-facing convention.
    """
    y = jnp.asarray(train_y)
    if y.ndim == 1:
        if n_tasks != 1:
            raise ValueError("1-d targets require n_tasks == 1")
        return y[None, :]
    if orientation == "tn":
        if y.shape[0] != n_tasks:
            raise ValueError(f"expected (T={n_tasks}, n) targets, got {y.shape}")
        return y
    if orientation == "nt":
        if y.shape[1] != n_tasks:
            raise ValueError(f"expected (n, T={n_tasks}) targets, got {y.shape}")
        return y.T
    if y.shape[0] == n_tasks and y.shape[1] != n_tasks:
        return y
    return y.T


def _resolve(registry, spec, default):
    if spec is None:
        spec = default
    if isinstance(spec, str):
        return registry[spec]
    return spec


class ExactGPModel(Module):
    """Exact GP; batch dimension = independent tasks (or latents)."""

    _buffers_ = ("train_x", "train_y")

    def __init__(self, train_x, train_y, likelihood: GaussianLikelihood,
                 n_tasks: int = 1, prior_scales=None, prior_width=None,
                 mean_type="constant", decomp=None, outputscales: bool = False,
                 kernel_type="rbf", ker_kwargs=None, n_inducing_points=None,
                 seed: int = 0, sgpr_titsias_var: bool = True, **kwargs):
        train_x = jnp.asarray(train_x)
        if train_x.ndim == 1:
            train_x = train_x[:, None]
        dtype = train_x.dtype
        self.train_x = train_x
        self.train_y = jnp.asarray(_canon_targets(train_y, n_tasks), dtype)
        self.likelihood = likelihood
        self.n_tasks = int(n_tasks)
        self.n_funcs = int(n_tasks)  # batch size; stays = n_latents in ProjectedGPModel
        self.dim = int(train_x.shape[1])

        mean_cls = _resolve(MEAN_REGISTRY, mean_type, "constant")
        self.mean_module = mean_cls(input_size=self.dim, batch_shape=n_tasks,
                                    dtype=dtype, seed=seed)
        self.covar_module = handle_covar(
            _resolve(KERNEL_REGISTRY, kernel_type, "rbf"), dim=self.dim,
            decomp=decomp, prior_scales=prior_scales, prior_width=prior_width,
            outputscales=outputscales, n_funcs=n_tasks,
            ker_kwargs=ker_kwargs, dtype=dtype)

        if n_inducing_points is not None:
            rng = np.random.default_rng(seed)
            self.inducing_points = jnp.asarray(
                rng.standard_normal((int(n_inducing_points), self.dim)), dtype)
        else:
            self.inducing_points = None
        # Titsias predictive variance (kss − q_ss gap added) vs the
        # reference's degenerate SoR variance — see posterior(); flag kept
        # so parity studies can reproduce the reference's collapse.
        self.sgpr_titsias_var = bool(sgpr_titsias_var)

    # -- basic quantities ----------------------------------------------------
    @property
    def sgpr(self) -> bool:
        return self.inducing_points is not None

    def prior(self, x) -> MultivariateNormal:
        """Prior p(f(x)): batched MVN with mean (T, n), covar (T, n, n).

        On the SGPR path the covariance is the Nyström approximation
        Q = K_xz K_zz⁻¹ K_zx, as in gpytorch's InducingPointKernel."""
        mean = self.mean_module(x)
        if self.sgpr:
            R = self._low_rank_root(x)
            covar = jnp.matmul(R, jnp.swapaxes(R, -1, -2), precision=_HIGHEST)
        else:
            covar = self.covar_module(x)
        return MultivariateNormal(mean, covar)

    def __call__(self, x):
        """Train-mode forward (prior), multitask-wrapped if the likelihood is
        not a batched Gaussian — mirrors projected_lmc.py:306-321."""
        mvn = self.prior(x)
        if self.n_funcs > 1 and not isinstance(self.likelihood, GaussianLikelihood):
            return MultitaskMultivariateNormal.from_batch_mvn(mvn)
        return mvn

    def _low_rank_root(self, x):
        """R = K_xz L_zz⁻ᵀ, (T, n, m)."""
        z = self.inducing_points
        Kzz = self.covar_module(z)
        m = Kzz.shape[-1]
        Lzz = safe_cholesky(Kzz + 1e-6 * jnp.eye(m, dtype=Kzz.dtype))
        Kxz = self.covar_module(x, z)
        return jnp.swapaxes(
            solve_triangular(Lzz, jnp.swapaxes(Kxz, -1, -2), lower=True), -1, -2)

    # -- marginal likelihood pieces -------------------------------------------
    def log_marginal(self, y=None, x=None, orientation: str = "auto"):
        """Per-task log N(y_t; m_t, K_t + σ_t² I) — shape (T,). On the SGPR path
        this is the Titsias bound including the −tr(K−Q)/2σ² correction."""
        x = self.train_x if x is None else x
        y = self.train_y if y is None else _canon_targets(y, self.n_funcs, orientation)
        n = x.shape[0]
        delta = y - self.mean_module(x)
        noise = self.likelihood.noise  # (T, 1)
        if self.sgpr:
            return self._sgpr_log_prob(x, delta, noise)
        K = self.covar_module(x)
        Kp = K + noise[..., None] * jnp.eye(n, dtype=K.dtype)
        L = safe_cholesky(Kp)
        z = solve_triangular(L, delta[..., None], lower=True)[..., 0]
        return -0.5 * (jnp.sum(z * z, axis=-1) + logdet_from_chol(L)
                       + n * math.log(2 * math.pi))

    # dense batched-Cholesky ceiling for the iterative routing: T·n² fp32
    # elements ≈ 4 GB — above it the batched factorization (workspace
    # included) no longer fits a 16 GB chip comfortably
    ITER_TN2_MAX = 2 ** 30

    def mll(self, x=None, y=None, iterative: bool = None, key=None,
            num_probes: int = 10, max_cg_iters: int = 256,
            cg_tol: float = 1e-2, matvec_bf16: bool = False,
            precond_rank: int = 256):
        """Exact marginal log-likelihood, summed over the task batch and scaled
        by 1/n (gpytorch ExactMarginalLogLikelihood semantics for the scalar
        losses used in experiments.py:267). Includes hyper-prior terms.

        Above the dense-Cholesky memory ceiling (T·n² > ITER_TN2_MAX, or
        ``iterative=True``) the batch of independent GPs is evaluated
        matrix-free with the same fused PCG+Lanczos-quadrature machinery as
        :class:`MultitaskGPModel` — it IS the LMC Σ_b K_b ⊗ e_b e_bᵀ +
        I ⊗ diag(σ²) with identity mixing. gpytorch reaches this scale via
        its eager CG; the dense batched factorization at n=16k, T=7 is a
        7 GB stack before workspace. Pass a fresh ``key`` per step (probes
        are redrawn); ``matvec_bf16`` halves the CG stream.

        ``precond_rank <= 0`` selects the default Nyström rank min(256, n)
        (the batched-exact route always runs preconditioned). On an SGPR
        model ``iterative=True`` raises: the Titsias bound is already
        matrix-free in n and would ignore every CG kwarg."""
        x_ = self.train_x if x is None else x
        n = x_.shape[0]
        if iterative and self.sgpr:
            raise ValueError(
                "iterative=True is not available on an SGPR model: the "
                "Titsias bound is already matrix-free in n (its dense work "
                "is m×m), and the CG/probe kwargs would be silently "
                "ignored. Drop iterative/num_probes/max_cg_iters/... or "
                "build the model without n_inducing_points.")
        if iterative is None:
            iterative = ((not self.sgpr)
                         and self.n_funcs * n * n > self.ITER_TN2_MAX)
            if iterative:
                import warnings
                warnings.warn(
                    "ExactGPModel.mll: T·n² exceeds the dense-Cholesky "
                    "ceiling — auto-routing to the matrix-free PCG/SLQ "
                    "estimator. The MLL becomes stochastic: thread a fresh "
                    "`key` per optimizer step (with key=None the probes are "
                    "frozen at PRNGKey(0), a fixed-realization objective); "
                    "pass iterative=False to force the dense path.",
                    stacklevel=2)
        if not iterative:
            ll = self.log_marginal(y=y, x=x)
            return (jnp.sum(ll) + self.covar_module.prior_log_prob()) / n
        from ..ops import iterative as it_ops
        from ..ops import fused_mll
        from .multitask import _fused_stationary_spec
        y_ = (self.train_y if y is None
              else _canon_targets(y, self.n_funcs))
        Ydelta = (y_ - self.mean_module(x_)).T                  # (n, T)
        T = self.n_funcs
        H = jnp.eye(T, dtype=x_.dtype)
        St = jnp.diag(self.likelihood.noise[..., 0])
        if precond_rank <= 0:
            # this route always needs Nyström roots (the unpreconditioned
            # SLQ fallback exists only on MultitaskGPModel's LMC route), so
            # <= 0 selects the default rank — same convention as the ICM
            # iterative route (multitask.py)
            precond_rank = min(256, n)
        if key is None:
            key = jax.random.PRNGKey(0)
        k1, k2 = jax.random.split(key)
        roots = self._precond_roots(x_, precond_rank)           # (T, n, m)
        m_rank = int(roots.shape[-1])
        eps = jax.random.normal(k1, (num_probes, n, T), Ydelta.dtype)
        xi = jax.random.normal(k2, (num_probes, T, m_rank), Ydelta.dtype)
        spec = _fused_stationary_spec(self.covar_module, self.dim)
        if spec is not None:
            kind, ls, os_ = spec
            ll = fused_mll.lmc_pcg_log_prob_stationary(
                jax.lax.stop_gradient(x_), ls, os_, H, St, Ydelta, eps, xi,
                roots, kind, max_cg_iters, cg_tol, matvec_bf16, m_rank)
        else:
            Ks = self.covar_module(x_)
            if matvec_bf16:
                Ks = Ks.astype(jnp.bfloat16)
            ll = it_ops.lmc_pcg_log_prob(Ks, H, St, Ydelta, eps, xi, roots,
                                         max_cg_iters, cg_tol, matvec_bf16,
                                         m_rank)
        return (ll + self.covar_module.prior_log_prob()) / n

    def _precond_roots(self, x, rank: int, jitter: float = 1e-4):
        """Nyström roots of the batched task kernels at strided landmarks
        (ops/iterative.nystrom_roots_from_covar)."""
        from ..ops.iterative import nystrom_roots_from_covar
        return nystrom_roots_from_covar(self.covar_module, x, rank, jitter)

    def _sgpr_log_prob(self, x, delta, noise):
        """Titsias SGPR bound per task: log N(y; m, Q+σ²I) − tr(K−Q)/(2σ²)."""
        n = x.shape[0]
        R = self._low_rank_root(x)                       # (T, n, m)
        m = R.shape[-1]
        s2 = noise[..., 0][:, None, None]                # (T,1,1)
        cap = jnp.matmul(jnp.swapaxes(R, -1, -2), R, precision=_HIGHEST) \
            + s2 * jnp.eye(m, dtype=R.dtype)
        Lc = safe_cholesky(cap)
        Rty = jnp.matmul(jnp.swapaxes(R, -1, -2), delta[..., None], precision=_HIGHEST)
        w = solve_triangular(Lc, Rty, lower=True)[..., 0]
        s2v = noise[..., 0]                              # (T,)
        quad = (jnp.sum(delta * delta, axis=-1) - jnp.sum(w * w, axis=-1)) / s2v
        logdet = (n - m) * jnp.log(s2v) + logdet_from_chol(Lc)
        k_diag = self.covar_module(x, diag=True)         # (T, n)
        q_diag = jnp.sum(R * R, axis=-1)
        trace_term = jnp.sum(jnp.clip(k_diag - q_diag, min=0.0), axis=-1) / (2 * s2v)
        return -0.5 * (quad + logdet + n * math.log(2 * math.pi)) - trace_term

    # -- posterior -------------------------------------------------------------
    def precompute_posterior(self, targets=None, orientation: str = "auto"):
        """Factorize the training system once; the functional analog of
        gpytorch's cached prediction strategy (and of the ``set_train_data``
        re-targeting trick at projected_lmc.py:1104,1133 — pass ``targets``)."""
        x = self.train_x
        y = self.train_y if targets is None else _canon_targets(
            targets, self.n_funcs, orientation)
        delta = y - self.mean_module(x)
        noise = self.likelihood.noise
        if self.sgpr:
            R = self._low_rank_root(x)
            m = R.shape[-1]
            s2 = noise[..., 0][:, None, None]
            cap = jnp.matmul(jnp.swapaxes(R, -1, -2), R, precision=_HIGHEST) \
                + s2 * jnp.eye(m, dtype=R.dtype)
            Lc = safe_cholesky(cap)
            Rty = jnp.matmul(jnp.swapaxes(R, -1, -2), delta[..., None], precision=_HIGHEST)
            beta = cho_solve(Lc, Rty)[..., 0]            # (T, m)
            return dict(kind=CacheTag("sgpr"), Lc=Lc, beta=beta, noise=noise)
        n = x.shape[0]
        K = self.covar_module(x)
        Kp = K + noise[..., None] * jnp.eye(n, dtype=K.dtype)
        L = safe_cholesky(Kp)
        alpha = cho_solve(L, delta[..., None])[..., 0]   # (T, n)
        return dict(kind=CacheTag("exact"), L=L, alpha=alpha)

    def posterior(self, x_star, cache=None, full_cov: bool = True,
                  targets=None) -> MultivariateNormal:
        """Latent posterior p(f* | data): batched MVN (T, n*)."""
        if cache is None:
            cache = self.precompute_posterior(targets)
        mean_star = self.mean_module(x_star)
        if cache["kind"] == "sgpr":
            Rs = self._low_rank_root(x_star)             # (T, n*, m)
            mean = mean_star + jnp.matmul(Rs, cache["beta"][..., None],
                                          precision=_HIGHEST)[..., 0]
            s2 = cache["noise"][..., 0][:, None, None]
            V = solve_triangular(cache["Lc"], jnp.swapaxes(Rs, -1, -2), lower=True)
            # Titsias predictive: kss − q_ss + σ²·R* cap⁻¹ R*ᵀ. The first
            # two terms are the low-rank gap k(x*,x*) − diag(R* R*ᵀ),
            # clipped ≥0 like the bound's trace term — WITHOUT it the
            # variance is the degenerate subset-of-regressors one, which
            # collapses to 0 far from the inducing points instead of
            # reverting to the prior. NOTE this is a flagged IMPROVEMENT
            # over the reference: gpytorch's InducingPointKernel applies
            # the kss−qss correction only in the training loss
            # (InducingPointKernelAddedLossTerm), so the reference's
            # predictive variance collapses too (diag_ship_icm.md exp 2;
            # found via diag_sarcos experiment 1, round 5). Set
            # sgpr_titsias_var=False to reproduce the reference's SoR
            # behavior in parity studies.
            if self.sgpr_titsias_var:
                kss_diag = self.covar_module(x_star, diag=True)  # (T, n*)
                gap = jnp.clip(kss_diag - jnp.sum(Rs * Rs, axis=-1), min=0.0)
            else:
                gap = jnp.zeros(Rs.shape[:-1], Rs.dtype)
            if full_cov:
                covar = s2 * jnp.matmul(jnp.swapaxes(V, -1, -2), V,
                                        precision=_HIGHEST) \
                    + jax.vmap(jnp.diag)(gap)
                return MultivariateNormal(mean, covar)
            var = cache["noise"][..., 0][:, None] * jnp.sum(V * V, axis=-2) \
                + gap
            return _DiagMVN(mean, var)
        Ks = self.covar_module(self.train_x, x_star)     # (T, n, n*)
        mean = mean_star + jnp.einsum("tns,tn->ts", Ks, cache["alpha"],
                                      precision=_HIGHEST)
        Vs = solve_triangular(cache["L"], Ks, lower=True)
        if full_cov:
            Kss = self.covar_module(x_star)
            covar = Kss - jnp.matmul(jnp.swapaxes(Vs, -1, -2), Vs, precision=_HIGHEST)
            return MultivariateNormal(mean, covar)
        kss_diag = self.covar_module(x_star, diag=True)
        var = kss_diag - jnp.sum(Vs * Vs, axis=-2)
        return _DiagMVN(mean, jnp.clip(var, min=1e-12))

    # -- introspection ----------------------------------------------------------
    def lscales(self, unpacked: bool = True):
        """Learned lengthscales, (n_funcs, dims) per subkernel
        (projected_lmc.py:324-346)."""
        cm = self.covar_module
        if hasattr(cm, "kernels"):  # AdditiveKernel (composite decomp)
            return [np.squeeze(np.asarray(k.lengthscale)) for k in cm.kernels]
        scales = np.squeeze(np.asarray(cm.lengthscale))
        return scales if unpacked else [scales]

    def outputscale(self, unpacked: bool = False):
        """Learned outputscales (n_funcs, n_kernels) (projected_lmc.py:348-365)."""
        cm = self.covar_module
        if hasattr(cm, "kernels"):
            res = np.stack([np.asarray(k.outputscale) for k in cm.kernels], axis=1)
            return res
        if hasattr(cm, "outputscale"):
            res = np.asarray(cm.outputscale)[:, None]
        else:
            res = np.ones((self.n_funcs, 1))
        return res.squeeze() if unpacked else res

    def kernel_cond(self):
        """Condition number of the train covariance incl. noise
        (projected_lmc.py:367-369)."""
        K = self.covar_module(self.train_x)
        n = K.shape[-1]
        Kp = K + self.likelihood.noise[..., None] * jnp.eye(n, dtype=K.dtype)
        return jnp.linalg.cond(Kp)

    def compute_loo(self, targets=None, complex_mean: bool = False,
                    orientation: str = "auto"):
        """Exact LOO residuals & variances via σᵢ² = 1/[K⁻¹]ᵢᵢ
        (projected_lmc.py:371-436). Returns (sigma2, y_minus_mu), both (n, T).

        ``complex_mean`` applies the universal-kriging correction
        K⁻ := K⁻¹ − K⁻¹H(HᵀK⁻¹H)⁻¹HᵀK⁻¹ with H the mean's basis matrix
        (projected_lmc.py:417-430); requires a mean with ``basis_matrix``."""
        x = self.train_x
        y = self.train_y if targets is None else _canon_targets(
            targets, self.n_funcs, orientation)
        delta = y - self.mean_module(x)
        n = x.shape[0]
        K = self.covar_module(x)
        Kp = K + self.likelihood.noise[..., None] * jnp.eye(n, dtype=K.dtype)
        L = safe_cholesky(Kp)
        if complex_mean:
            try:
                H = self.mean_module.basis_matrix(x)     # (n, k)
            except AttributeError as e:
                raise ValueError("A complex mean treatment was required, but the "
                                 "model mean function doesn't allow it!") from e
            eye = jnp.eye(n, dtype=K.dtype)
            K_inv = cho_solve(L, jnp.broadcast_to(eye, Kp.shape))     # (T, n, n)
            KiH = jnp.matmul(K_inv, H[None], precision=_HIGHEST)      # (T, n, k)
            M = jnp.matmul(jnp.swapaxes(KiH, -1, -2), H[None], precision=_HIGHEST)
            Lm = safe_cholesky(M + 1e-6 * jnp.eye(M.shape[-1], dtype=M.dtype))
            corr = jnp.matmul(KiH, cho_solve(Lm, jnp.swapaxes(KiH, -1, -2)),
                              precision=_HIGHEST)
            K_minus = K_inv - corr
            sigma2 = 1.0 / jnp.diagonal(K_minus, axis1=-2, axis2=-1)
            alpha = jnp.matmul(K_minus, y[..., None], precision=_HIGHEST)[..., 0]
            yminusmu = alpha * sigma2
            if self.n_funcs > 1:
                return (jax.lax.stop_gradient(sigma2.T),
                        jax.lax.stop_gradient(yminusmu.T))
            return sigma2.T, yminusmu.T
        inv_diag = chol_inverse_diag(L)                  # (T, n)
        sigma2 = 1.0 / inv_diag
        alpha = cho_solve(L, delta[..., None])[..., 0]
        yminusmu = alpha * sigma2
        if self.n_funcs > 1:
            # the reference detaches LOO quantities in the multitask branch only
            # (projected_lmc.py:408); the single-output path stays differentiable
            # so the LOO pseudo-likelihood can train hyperparameters.
            return jax.lax.stop_gradient(sigma2.T), jax.lax.stop_gradient(yminusmu.T)
        return sigma2.T, yminusmu.T


class _DiagMVN(MultivariateNormal):
    """MVN carrying only the diagonal of its covariance (cheap prediction)."""

    def __init__(self, mean, var):
        self.mean = jnp.asarray(mean)
        self._var = jnp.asarray(var)

    @property
    def variance(self):
        return self._var

    @property
    def covariance_matrix(self):
        return jax.vmap(jnp.diag)(self._var) if self._var.ndim == 2 else jnp.diag(self._var)

    def log_prob(self, value):
        z2 = (value - self.mean) ** 2 / self._var
        return -0.5 * jnp.sum(z2 + jnp.log(self._var) + math.log(2 * math.pi), axis=-1)
