"""Exact multitask GP: ICM and (naive) LMC coregionalization.

TPU-native counterpart of ``MultitaskGPModel`` (projected_lmc.py:438-656).
Where gpytorch represents the n·p × n·p covariance lazily and falls back to
CG + stochastic Lanczos logdets, this implementation dispatches on structure:

  * ICM  (K ⊗ B + I ⊗ Σt): exact Kronecker joint diagonalization
    (ops/kron.py) — two eigendecompositions per step instead of CG sweeps.
  * LMC  (Σ_b K_b ⊗ h_b h_bᵀ + I ⊗ Σt): exact Woodbury/determinant-lemma path
    (ops/woodbury.py) — batched n×n Choleskys + one qn×qn Cholesky, fully
    dense and deterministic on the MXU.

The task covariance of the ICM is B = F Fᵀ + diag(exp(raw_var)) with F the
rank-q ``covar_factor`` (SVD-initialized from the labels, projected_lmc.py:468-476);
``fix_diagonal`` freezes raw_var at −10 (projected_lmc.py:480-489).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from ..module import Module, CacheTag
from ..kernels import handle_covar, KERNEL_REGISTRY
from ..means import MEAN_REGISTRY
from ..likelihoods import MultitaskGaussianLikelihood
from ..distributions import (MultitaskMultivariateNormal, KronCov, SumKronRank1Cov)
from ..ops import kron as kron_ops
from ..ops import woodbury as wb_ops
from ..ops import iterative as it_ops
from ..ops import fused_mll
from ..ops.init_ops import init_lmc_coefficients
from ..ops.cholesky import safe_cholesky, logdet_from_chol, solve_triangular
from .exact import _resolve, _canon_targets

_HIGHEST = jax.lax.Precision.HIGHEST


def _fused_stationary_spec(cov, dim):
    """(kind, lengthscale (q,1,d), outputscale (q,)) when ``cov`` is a bare
    or Scale-wrapped stationary kernel the fused MLL op
    (ops/fused_mll.lmc_pcg_log_prob_stationary) can build internally;
    None routes to the composed kernel→log-prob path (additive decomp,
    proper-subset active_dims, spectral-mixture, or use_pallas=False
    opt-outs). ``dim``: the input feature count — active_dims covering the
    full range is the identity slice handle_covar emits by default.

    Multi-TPU sessions also route composed: the fused op's pallas_call is
    not automatically partitionable under pjit (XLA would have to
    replicate/gather its sharded operands), whereas the composed path's
    einsums partition cleanly over a ('data','latent') mesh — the
    single-chip fused win is not worth breaking SPMD semantics. (On the
    multi-device CPU test mesh the fused op lowers to pure XLA einsums —
    no pallas_call — so the route stays on and partitions fine.)"""
    import jax as _jax
    if _jax.default_backend() == "tpu" and _jax.device_count() > 1:
        return None
    from .. import kernels as kmod
    base, os_ = cov, None
    if isinstance(cov, kmod.ScaleKernel):
        base, os_ = cov.base_kernel, cov.outputscale
    kind = getattr(base, "_pallas_kind", None)
    full_slice = (base.active_dims is None
                  or tuple(base.active_dims) == tuple(range(int(dim))))
    if kind is None or not full_slice or not getattr(base, "use_pallas", False):
        return None
    if os_ is None:
        os_ = jnp.ones((base.batch,), base.lengthscale.dtype)
    return kind, base.lengthscale, os_


class MultitaskGPModel(Module):
    """Exact ICM / LMC multitask GP (projected_lmc.py:438-656)."""

    _buffers_ = ("train_x", "train_y")

    def __init__(self, train_x, train_y, likelihood: MultitaskGaussianLikelihood = None,
                 n_tasks: int = None, n_latents: int = 1, model_type: str = "ICM",
                 init_lmc_coeffs: bool = True, fix_diagonal: bool = False,
                 mean_type="constant", kernel_type="rbf", decomp=None,
                 prior_scales=None, prior_width=None, ker_kwargs=None,
                 n_inducing_points=None, seed: int = 0,
                 sgpr_titsias_var: bool = True, **kwargs):
        if model_type not in ("ICM", "LMC"):
            raise ValueError("Wrong specified model type, should be ICM or LMC")
        train_x = jnp.asarray(train_x)
        if train_x.ndim == 1:
            train_x = train_x[:, None]
        dtype = train_x.dtype
        y = jnp.asarray(train_y, dtype)
        if n_tasks is None:
            n_tasks = y.shape[-1]
        self.train_x = train_x
        self.train_y = _canon_targets(y, n_tasks)        # stored (T, n)
        # the reference supports a likelihood-less call signature via the
        # missing `mogp_icm` module (realdata_experiments.py:10); here the
        # in-package model serves both (SURVEY §2 known defects)
        if likelihood is None:
            likelihood = MultitaskGaussianLikelihood(num_tasks=n_tasks,
                                                     rank=0, seed=seed, dtype=dtype)
        self.likelihood = likelihood
        self.n_tasks, self.n_latents, self.model_type = int(n_tasks), int(n_latents), model_type
        self.dim = int(train_x.shape[1])

        mean_cls = _resolve(MEAN_REGISTRY, mean_type, "constant")
        self.mean_module = mean_cls(input_size=self.dim, batch_shape=n_tasks,
                                    dtype=dtype, seed=seed)

        n_kernels = 1 if model_type == "ICM" else n_latents
        self.covar_module = handle_covar(
            _resolve(KERNEL_REGISTRY, kernel_type, "rbf"), dim=self.dim,
            decomp=decomp, prior_scales=prior_scales, prior_width=prior_width,
            outputscales=False, n_funcs=n_kernels, ker_kwargs=ker_kwargs, dtype=dtype)

        rng = np.random.default_rng(seed)
        if init_lmc_coeffs:
            # host-side copy of the ORIGINAL input for the SVD init — going
            # through self.train_y would be a device->host round trip at
            # construction time (minutes each when the TPU tunnel is degraded)
            y_host = np.asarray(train_y, dtype)
            if y_host.ndim == 1:
                y_host = y_host[:, None]
            elif y_host.shape[0] == n_tasks and y_host.shape[1] != n_tasks:
                y_host = y_host.T                                       # (n, T)
            coeffs = np.asarray(init_lmc_coefficients(y_host, n_latents))  # (q, T)
            factor = coeffs.T                                           # (T, q)
        else:
            factor = rng.standard_normal((n_tasks, n_latents))
        if model_type == "ICM":
            self.covar_factor = jnp.asarray(factor, dtype)              # (T, q)
        else:
            # q rank-1 coregionalizations, each with its own kernel copy
            self.covar_factor = jnp.asarray(factor.T[..., None], dtype)  # (q, T, 1)

        # diagonal term of the task covariance(s): exp(raw_var) as in gpytorch's
        # IndexKernel; fix_diagonal freezes it at -10 (projected_lmc.py:480-489)
        shape = (n_tasks,) if model_type == "ICM" else (n_latents, n_tasks)
        if fix_diagonal:
            self.raw_var = jnp.full(shape, -10.0, dtype)
            self._frozen_params_ = ("raw_var",) + tuple(self._frozen_params_)
        else:
            self.raw_var = jnp.asarray(rng.standard_normal(shape), dtype)

        if n_inducing_points is not None:
            self.inducing_points = jnp.asarray(
                rng.standard_normal((int(n_inducing_points), self.dim)), dtype)
        else:
            self.inducing_points = None
        # Titsias predictive variance vs the reference's degenerate SoR one
        # (see models/exact.py posterior note; flag for parity studies)
        self.sgpr_titsias_var = bool(sgpr_titsias_var)

    # -- SGPR (Titsias inducing-point) machinery ---------------------------------
    @property
    def sgpr(self) -> bool:
        return self.inducing_points is not None

    def _nystrom_roots(self, x):
        """Low-rank kernel roots R_b = K_xz L_zz⁻ᵀ, (n_kernels, n, m) — the
        Nyström factors of gpytorch's InducingPointKernel
        (projected_lmc.py:302-303), here per latent kernel."""
        z = self.inducing_points
        Kzz = self.covar_module(z)
        m = Kzz.shape[-1]
        Lzz = safe_cholesky(Kzz + 1e-6 * jnp.eye(m, dtype=Kzz.dtype))
        Kxz = self.covar_module(x, z)
        return jnp.swapaxes(
            solve_triangular(Lzz, jnp.swapaxes(Kxz, -1, -2), lower=True), -1, -2)

    def _precond_roots(self, x, rank: int, jitter: float = 1e-4):
        """Nyström roots of the latent kernels at strided landmarks
        (ops/iterative.nystrom_roots_from_covar)."""
        return it_ops.nystrom_roots_from_covar(
            self.covar_module, x, rank, jitter)

    def _sgpr_structure(self, x):
        """(roots_eff, H_eff, St_eff, titsias) for the low-rank Woodbury MLL.

        ICM reduces to 'LMC with T pseudo-latents': Q ⊗ B = Σ_b Q ⊗ s_b s_bᵀ
        with s_b the columns of chol(B), so one root set broadcast over T.
        The Titsias ELBO correction is −tr((I⊗Σt)⁻¹ ((K−Q)⊗B))/2
        = −½ Σᵢ (Kᵢᵢ−Qᵢᵢ)·tr(Σt⁻¹B) (ICM), resp. per-latent with h_bᵀΣt⁻¹h_b
        (LMC) — the multitask analog of gpytorch's
        InducingPointKernelAddedLossTerm."""
        roots = self._nystrom_roots(x)                          # (k, n, m)
        k_diag = self.covar_module(x, diag=True)                # (k, n)
        q_diag = jnp.sum(roots * roots, axis=-1)                # (k, n)
        traces = jnp.sum(jnp.clip(k_diag - q_diag, min=0.0), axis=-1)  # (k,)
        Sigma_t = self.likelihood.task_covariance()
        Rt = safe_cholesky(Sigma_t)
        if self.model_type == "ICM":
            B = self.task_covar_matrix()
            S_B = safe_cholesky(B + 1e-10 * jnp.eye(self.n_tasks, dtype=B.dtype))
            roots_eff = jnp.broadcast_to(roots[0], (self.n_tasks,) + roots[0].shape)
            H_eff = S_B                                         # columns mix tasks
            # tr(Σt⁻¹ B) via the Cholesky of Σt
            V = solve_triangular(Rt, S_B, lower=True)
            titsias = -0.5 * traces[0] * jnp.sum(V * V)
            return roots_eff, H_eff, Sigma_t, titsias
        H_eff = self.covar_factor[..., 0].T                     # (T, q)
        St_eff = Sigma_t + jnp.diag(self._lmc_extra_diag())
        Rt = safe_cholesky(St_eff)
        V = solve_triangular(Rt, H_eff, lower=True)             # (T, q)
        titsias = -0.5 * jnp.sum(traces * jnp.sum(V * V, axis=0))
        return roots, H_eff, St_eff, titsias

    # -- structure accessors ---------------------------------------------------
    def task_covar_matrix(self):
        """ICM: B = F Fᵀ + diag(softplus(raw_var)), (T, T) — gpytorch IndexKernel.
        LMC: per-latent rank-1 B_b = h_b h_bᵀ + diag(softplus(raw_var_b)), (q, T, T)."""
        if self.model_type == "ICM":
            F = self.covar_factor
            return jnp.matmul(F, F.T, precision=_HIGHEST) + jnp.diag(jax.nn.softplus(self.raw_var))
        F = self.covar_factor                                  # (q, T, 1)
        B = jnp.matmul(F, jnp.swapaxes(F, -1, -2), precision=_HIGHEST)
        return B + jax.vmap(jnp.diag)(jax.nn.softplus(self.raw_var))

    def lmc_coefficients(self):
        """(q, T) mixing coefficients (projected_lmc.py:493-505)."""
        if self.model_type == "ICM":
            return np.asarray(self.covar_factor).T
        return np.asarray(self.covar_factor[..., 0])

    # -- prior / forward ---------------------------------------------------------
    def __call__(self, x):
        """Prior multitask distribution at x (projected_lmc.py:586-589)."""
        mean = self.mean_module(x).T                            # (n, T)
        if self.model_type == "ICM":
            K = self.covar_module(x)[0]
            return MultitaskMultivariateNormal(mean, KronCov(K, self.task_covar_matrix()))
        Ks = self.covar_module(x)                               # (q, n, n)
        H = self.covar_factor[..., 0].T                         # (T, q)
        return MultitaskMultivariateNormal(
            mean, SumKronRank1Cov(Ks, H, None))

    def _lmc_extra_diag(self):
        """Σ_b diag(softplus(raw_var_b)) — per-task variance capacity.

        Deliberate TPU-first design difference vs gpytorch's LCMKernel: there the
        per-latent task-diagonal sits *inside* each coregionalization
        (K_b ⊗ (h_bh_bᵀ + D_b)), which destroys the rank-1 Woodbury structure and
        forces CG. Here the same learnable per-task variance capacity is carried
        as a white task-covariance term I ⊗ Σ_b D_b, keeping inference exact and
        dense. With ``fix_diagonal=True`` (D ≈ 0, frozen) both models coincide
        exactly; the reference's experiments never exercise the non-frozen LMC."""
        return jnp.sum(jax.nn.softplus(self.raw_var), axis=0)

    # -- marginal likelihood -------------------------------------------------------
    # dense-Woodbury ceiling: above q·n the (qn)² capacitance stops being the
    # right tool and the matrix-free CG+SLQ path (ops/iterative.py) takes over —
    # the same regime where gpytorch switches from Cholesky to CG+Lanczos
    # (max_cholesky_size, experiments.py:306).
    DENSE_QN_MAX = 4096
    # ICM's dense path costs ONE n×n factorization (not q of them), so its
    # matrix-free switchover sits higher than the LMC q·n threshold
    ICM_DENSE_N_MAX = 8192

    def mll(self, x=None, y=None, key=None, iterative: bool = None,
            num_probes: int = 10, max_cg_iters: int = 256,
            cg_tol: float = 1e-2, slq_steps: int = 20,
            matvec_bf16: bool = False, precond_rank: int = 0,
            quad_method: str = "pcg", precond_roots=None,
            matvec_int8: bool = False):
        """Exact multitask MLL / (n·T), plus hyper-prior terms.

        For LMC at large scale (q·n > DENSE_QN_MAX, or ``iterative=True``) the
        log-prob is evaluated matrix-free with Hutchinson gradients — pass a
        fresh ``key`` per optimizer step to redraw probes (gpytorch redraws
        per evaluation). With ``precond_rank > 0`` and the default
        ``quad_method="pcg"``, solves AND logdet come from one fused
        Nyström-preconditioned CG pass (probes ~ N(0, M), Lanczos tridiagonals
        from the CG coefficients, logdet M exact — gpytorch's inv_quad_logdet
        estimator compiled to one XLA program); ``quad_method="slq"`` keeps
        the separate Rademacher-probe SLQ pass.

        ``precond_roots`` (q, n, rank): caller-supplied (possibly STALE)
        Nyström roots for the preconditioner M. The estimator is exact for
        ANY SPD M — its logdet/capacitance terms are computed from the same
        roots — so a preconditioner refreshed only every few optimizer steps
        (e.g. once per lax.scan chunk) trades nothing but CG iteration count
        for skipping the per-step landmark factorization (~13% of the
        training step at the benchmark scale on a v5e).

        ``matvec_int8``: run the CG loop (and, on the fused route, the
        backward's stack stream) on an int8-quantized kernel stack — ¼ the
        fp32 HBM bytes in the dominant phase, ~1% operator noise. Takes
        precedence over ``matvec_bf16``.

        PRECISION FLOOR (measured — results/PERF_NOTES.md): a low-precision
        matvec trains as if an extra jitter of ~‖K‖·4e-3 (bf16) / ~8e-3
        (int8) were added to the likelihood. Use bf16/int8 for the
        loss-descent bulk of training; once the learned noise approaches
        that scale, continue with the fp32 matvec (or the dense path) for
        deep convergence.
        """
        x = self.train_x if x is None else x
        y = self.train_y if y is None else _canon_targets(jnp.asarray(y), self.n_tasks)
        n = x.shape[0]
        Ydelta = y.T - self.mean_module(x).T                    # (n, T)
        Sigma_t = self.likelihood.task_covariance()
        if self.sgpr:
            roots, H_eff, St_eff, titsias = self._sgpr_structure(x)
            fac = wb_ops.lmc_factors_from_roots(roots, H_eff, St_eff)
            ll = wb_ops.lmc_log_prob(None, H_eff, St_eff, Ydelta, fac=fac) \
                + titsias
            return (ll + self.covar_module.prior_log_prob()) / (n * self.n_tasks)
        if self.model_type == "ICM":
            B = self.task_covar_matrix()
            icm_iterative = (n > self.ICM_DENSE_N_MAX if iterative is None
                             else iterative)
            if icm_iterative and precond_rank <= 0:
                # routing above the dense ceiling must not silently fall
                # back to icm_log_prob_chol — its T parallel (n, n) Choleskys
                # are O(T·n²) HBM (28.9 GB at n=16k, T=7 on a 16 GB chip).
                # The pcg estimator is exact for any SPD preconditioner, so
                # a default Nyström rank is always safe.
                precond_rank = min(256, n)
            if icm_iterative:
                # matrix-free large-n ICM: one (n, n) kernel stream per CG
                # matvec regardless of task count, preconditioner factored
                # per task-eigenvalue (ops/iterative.icm_pcg_log_prob) —
                # the regime the dense joint-diagonalization path cannot
                # reach (an n×n Cholesky at n=44k is ~7.7 GB fp32 for the
                # factor alone, before its O(n³) time)
                if key is None:
                    key = jax.random.PRNGKey(0)
                k1, k2 = jax.random.split(key)
                if precond_roots is not None:
                    # accept the LMC (k, n, m) convention too (e.g. stale
                    # roots computed once per scan chunk via _precond_roots)
                    roots = (precond_roots[0] if precond_roots.ndim == 3
                             else precond_roots)
                else:
                    roots = self._precond_roots(x, precond_rank)[0]
                # the probe rank must match the roots actually used — a
                # caller-supplied stale root of a different rank would
                # otherwise shape-clash with xi inside icm_pcg_log_prob
                m_rank = int(roots.shape[-1])
                eps = jax.random.normal(
                    k1, (num_probes, n, self.n_tasks), Ydelta.dtype)
                xi = jax.random.normal(
                    k2, (num_probes, m_rank, self.n_tasks), Ydelta.dtype)
                if matvec_bf16 and getattr(self.covar_module,
                                           "_pallas_kind", None):
                    K = self.covar_module(x, out_dtype=jnp.bfloat16)[0]
                elif matvec_bf16:
                    K = self.covar_module(x)[0].astype(jnp.bfloat16)
                else:
                    K = self.covar_module(x)[0]
                ll = it_ops.icm_pcg_log_prob(
                    K, B, Sigma_t, Ydelta, eps, xi, roots, max_cg_iters,
                    cg_tol, matvec_bf16, m_rank)
                return (ll + self.covar_module.prior_log_prob()) \
                    / (n * self.n_tasks)
            K = self.covar_module(x)[0]
            # batched-Cholesky variant: exact same MLL, one t×t eigh instead
            # of the n×n eigh (the training hot path; see icm_log_prob_chol)
            ll = kron_ops.icm_log_prob_chol(K, B, Sigma_t, Ydelta)
        else:
            H = self.covar_factor[..., 0].T
            St = Sigma_t + jnp.diag(self._lmc_extra_diag())
            if iterative is None:
                iterative = self.n_latents * n > self.DENSE_QN_MAX
            if iterative:
                if key is None:
                    key = jax.random.PRNGKey(0)
                if precond_rank > 0 and quad_method == "pcg":
                    k1, k2 = jax.random.split(key)
                    eps = jax.random.normal(
                        k1, (num_probes, n, self.n_tasks), Ydelta.dtype)
                    xi = jax.random.normal(
                        k2, (num_probes, self.n_latents,
                             min(precond_rank, n)), Ydelta.dtype)
                    roots = precond_roots if precond_roots is not None \
                        else self._precond_roots(x, precond_rank)
                    spec = _fused_stationary_spec(self.covar_module, self.dim)
                    if spec is not None:
                        # fully fused hot path: stack build + PCG + quadrature
                        # in ONE custom-VJP op whose backward recomputes dK
                        # tiles from low-rank factors in VMEM — the (q, n, n)
                        # cotangent and the elementwise VJP intermediate never
                        # reach HBM (ops/fused_mll.py)
                        kind, ls, os_ = spec
                        ll = fused_mll.lmc_pcg_log_prob_stationary(
                            jax.lax.stop_gradient(x), ls, os_, H, St, Ydelta,
                            eps, xi, roots, kind, max_cg_iters, cg_tol,
                            matvec_bf16, precond_rank, matvec_int8)
                        num_data = n * self.n_tasks
                        return (ll + self.covar_module.prior_log_prob()) \
                            / num_data
                    # bf16 stack END-TO-END, downcast at the producer: the
                    # Pallas tile builder writes bf16 tiles straight from
                    # VMEM (the XLA fallback fuses the cast into the
                    # construction epilogue) — no fp32 (q,n,n) object ever
                    # reaches HBM; the custom VJPs carry bf16 cotangents
                    # (preconditioner, probes, solves, reductions stay fp32)
                    if matvec_bf16:
                        Kin = self.covar_module(x, out_dtype=jnp.bfloat16) \
                            if getattr(self.covar_module, "_pallas_kind",
                                       None) else \
                            self.covar_module(x).astype(jnp.bfloat16)
                    else:
                        Kin = self.covar_module(x)
                    ll = it_ops.lmc_pcg_log_prob(
                        Kin, H, St, Ydelta, eps, xi, roots, max_cg_iters,
                        cg_tol, matvec_bf16, precond_rank, matvec_int8)
                else:
                    Ks = self.covar_module(x)
                    probes = it_ops.draw_probes(key, n, self.n_tasks,
                                                num_probes, Ydelta.dtype)
                    ll = it_ops.lmc_iterative_log_prob(
                        Ks, H, St, Ydelta, probes, max_cg_iters, cg_tol,
                        slq_steps, matvec_bf16, precond_rank)
            else:
                ll = wb_ops.lmc_log_prob(self.covar_module(x), H, St, Ydelta)
        num_data = n * self.n_tasks
        return (ll + self.covar_module.prior_log_prob()) / num_data

    # -- posterior ---------------------------------------------------------------
    def precompute_posterior(self, iterative: bool = None,
                             max_cg_iters: int = 400, cg_tol: float = 1e-5,
                             precond_rank: int = 256):
        x = self.train_x
        n = x.shape[0]
        Ydelta = self.train_y.T - self.mean_module(x).T
        Sigma_t = self.likelihood.task_covariance()
        if self.model_type == "LMC" and not self.sgpr:
            if iterative is None:
                iterative = self.n_latents * n > self.DENSE_QN_MAX
            if iterative:
                # matrix-free exact posterior mean (tight PCG solve) +
                # CONSERVATIVE variance: the correction is computed through
                # M_up = Σ_b Q_b ⊗ h_bh_bᵀ + I⊗(Σt + c·I) ⪰ Σ (Q_b = rank-k
                # Nyström, c = λmax of the residual), so M_up⁻¹ ⪯ Σ⁻¹ and the
                # returned variance sits between the exact posterior variance
                # and the prior — calibration errs toward over-coverage.
                Ks = self.covar_module(x)
                H = self.covar_factor[..., 0].T
                St = Sigma_t + jnp.diag(self._lmc_extra_diag())
                roots = self._precond_roots(x, precond_rank)
                minv = it_ops.nystrom_precond(Ks, H, St, precond_rank,
                                              roots=roots)
                Md = jnp.clip(it_ops._jacobi_diag(Ks, H, St), 1e-10)
                alpha = it_ops.batched_pcg(
                    lambda V: it_ops.lmc_matvec(Ks, H, St, V),
                    Ydelta[None], Md, max_iters=max_cg_iters, tol=cg_tol,
                    minv=minv)[0]
                c = it_ops.residual_spectral_bound(Ks, roots, H)
                St_up = St + c * jnp.eye(self.n_tasks, dtype=St.dtype)
                fac_up = wb_ops.lmc_factors_from_roots(roots, H, St_up)
                return dict(kind=CacheTag("lmc_iter"), alpha=alpha, H=H, Sigma_t=St,
                            fac=fac_up)
        if self.sgpr:
            roots, H_eff, St_eff, _ = self._sgpr_structure(x)
            fac = wb_ops.lmc_factors_from_roots(roots, H_eff, St_eff)
            alpha = wb_ops.lmc_solve(Ydelta, fac)
            return dict(kind=CacheTag("sgpr"), fac=fac, alpha=alpha, H=H_eff,
                        Sigma_t=St_eff)
        if self.model_type == "ICM":
            K = self.covar_module(x)[0]
            B = self.task_covar_matrix()
            icm_iterative = (n > self.ICM_DENSE_N_MAX if iterative is None
                             else iterative)
            if icm_iterative:
                # matrix-free ICM posterior: the n×n eigh of the dense path
                # is out of reach at this scale (the remote TPU compiler is
                # killed at n=16k). Mean: tight PCG with the one-K-stream
                # ICM matvec. Variance: conservative through M_up = Q ⊗ B +
                # I ⊗ (Σt + c·I) ⪰ Σ, with Q the rank-m Nyström
                # approximation of K and c the Kronecker-factorized residual
                # bound λmax(K−Q)·λmax(B) — like the LMC branch above, but
                # exploiting the shared kernel so no (t, n, ·) broadcast is
                # ever materialized (ops/iterative.icm_nystrom_posterior_
                # variance).
                if precond_rank <= 0:
                    precond_rank = 256     # same guard as mll's routing
                m_rank = min(precond_rank, n)
                roots = it_ops.nystrom_roots_from_kernels(K[None], m_rank)[0]
                _, _, _, minv, _ = it_ops._icm_nystrom_parts(
                    K, B, Sigma_t, m_rank, roots=roots)
                Md = jnp.clip(jnp.outer(jnp.diagonal(K), jnp.diagonal(B))
                              + jnp.diagonal(Sigma_t)[None, :], 1e-10)
                alpha = it_ops.batched_pcg(
                    lambda V: it_ops.icm_matvec(K, B, Sigma_t, V),
                    Ydelta[None], Md, max_iters=max_cg_iters, tol=cg_tol,
                    minv=minv)[0]
                c = it_ops.icm_residual_spectral_bound(K, roots, B)
                St_up = Sigma_t + c * jnp.eye(self.n_tasks,
                                              dtype=Sigma_t.dtype)
                parts = it_ops.icm_whitened_parts(None, B, St_up, m_rank,
                                                  roots=roots)
                return dict(kind=CacheTag("icm_iter"), alpha=alpha, B=B,
                            Sigma_t=Sigma_t, R=parts["R"],
                            gam=parts["gam"], P_inv=parts["P_inv"],
                            C_inv=parts["C_inv"])
            fac = kron_ops.icm_eig_factors(K, B, Sigma_t)
            alpha = kron_ops.icm_solve(Ydelta, fac)
            return dict(kind=CacheTag("icm"), fac=fac, alpha=alpha, B=B, Sigma_t=Sigma_t)
        Ks = self.covar_module(x)
        H = self.covar_factor[..., 0].T
        St = Sigma_t + jnp.diag(self._lmc_extra_diag())
        fac = wb_ops.lmc_factors(Ks, H, St)
        alpha = wb_ops.lmc_solve(Ydelta, fac)
        return dict(kind=CacheTag("lmc"), fac=fac, alpha=alpha, H=H, Sigma_t=St)

    def posterior(self, x_star, cache=None, observed: bool = True):
        """Posterior mean/variance at x_star as a Multitask distribution carrying
        the exact variance diagonal (covariance structure is not materialized)."""
        if cache is None:
            cache = self.precompute_posterior()
        mean_star = self.mean_module(x_star).T                  # (n*, T)
        if cache["kind"] == "sgpr":
            roots_star = self._nystrom_roots(x_star)            # (k, n*, m)
            kss_star = (self.covar_module(x_star, diag=True)    # (k, n*)
                        if self.sgpr_titsias_var else None)
            if self.model_type == "ICM":
                roots_star = jnp.broadcast_to(
                    roots_star[0], (self.n_tasks,) + roots_star[0].shape)
                if kss_star is not None:
                    kss_star = jnp.broadcast_to(
                        kss_star[0], (self.n_tasks,) + kss_star[0].shape)
            mean, var = wb_ops.lmc_sgpr_posterior(
                roots_star, cache["fac"], cache["alpha"], mean_star,
                noise=observed, kss_star=kss_star)
            return _MeanVarMT(mean, var)
        if cache["kind"] == "lmc_iter":
            Kstars = self.covar_module(x_star, self.train_x)    # (q, n*, n)
            mean = wb_ops.lmc_posterior_mean(Kstars, cache["H"], cache["alpha"],
                                             mean_star)
            kss = self.covar_module(x_star, diag=True)          # (q, n*)
            # correction through the inflated Nyström factors (conservative);
            # prior + noise use the TRUE Σt, only the solve uses St_up
            var = wb_ops.lmc_posterior_variance(
                Kstars, kss, cache["H"], cache["Sigma_t"], cache["fac"],
                noise=observed)
            return _MeanVarMT(mean, var)
        if cache["kind"] == "icm_iter":
            K_star = self.covar_module(x_star, self.train_x)[0]  # (n*, n)
            mean = kron_ops.icm_posterior_mean(K_star, cache["B"],
                                               cache["alpha"], mean_star)
            kss = self.covar_module(x_star, diag=True)[0]        # (n*,)
            # Kronecker-separated conservative variance: shares the one
            # (n*, n) cross-covariance across tasks (prior + noise use the
            # TRUE Σt; only the solve runs through the inflated St_up baked
            # into the whitened parts)
            var = it_ops.icm_nystrom_posterior_variance(
                K_star, kss, cache["B"], cache["Sigma_t"],
                dict(R=cache["R"], gam=cache["gam"],
                     P_inv=cache["P_inv"], C_inv=cache["C_inv"]),
                noise=observed)
            return _MeanVarMT(mean, var)
        if cache["kind"] == "icm":
            K_star = self.covar_module(x_star, self.train_x)[0]  # (n*, n)
            mean = kron_ops.icm_posterior_mean(K_star, cache["B"], cache["alpha"],
                                               mean_star)
            kss = self.covar_module(x_star, diag=True)[0]
            noise_diag = jnp.diagonal(cache["Sigma_t"]) if observed else None
            var = kron_ops.icm_posterior_variance(kss, K_star, cache["B"],
                                                  cache["fac"], noise_diag=noise_diag)
            return _MeanVarMT(mean, var)
        Kstars = self.covar_module(x_star, self.train_x)        # (q, n*, n)
        mean = wb_ops.lmc_posterior_mean(Kstars, cache["H"], cache["alpha"], mean_star)
        kss = self.covar_module(x_star, diag=True)              # (q, n*)
        var = wb_ops.lmc_posterior_variance(Kstars, kss, cache["H"],
                                            cache["Sigma_t"], cache["fac"],
                                            noise=observed)
        return _MeanVarMT(mean, var)

    def compute_var(self, x_star):
        """Memory-safe ICM posterior variance (projected_lmc.py:591-640)."""
        if self.model_type != "ICM":
            raise ValueError("This method is only available for ICM models")
        return self.posterior(x_star, observed=True).variance

    def compute_loo(self):
        """Multitask LOO on the full np system (projected_lmc.py:642-656)."""
        x = self.train_x
        n = x.shape[0]
        Ydelta = self.train_y.T - self.mean_module(x).T
        Sigma_t = self.likelihood.task_covariance()
        if self.sgpr:
            roots, H_eff, St_eff, _ = self._sgpr_structure(x)
            Ks = jnp.einsum("bik,bjk->bij", roots, roots, precision=_HIGHEST)
            cov = SumKronRank1Cov(Ks, H_eff, St_eff)
        elif self.model_type == "ICM":
            cov = KronCov(self.covar_module(x)[0], self.task_covar_matrix(), Sigma_t)
        else:
            H = self.covar_factor[..., 0].T
            St = Sigma_t + jnp.diag(self._lmc_extra_diag())
            cov = SumKronRank1Cov(self.covar_module(x), H, St)
        dense = cov.dense()
        L = safe_cholesky(dense)
        eye = jnp.eye(dense.shape[-1], dtype=dense.dtype)
        Linv = solve_triangular(L, eye, lower=True)
        inv_diag = jnp.sum(Linv * Linv, axis=0)
        sigma2 = 1.0 / inv_diag
        alpha = jax.scipy.linalg.cho_solve((L, True), Ydelta.reshape(-1))
        yminusmu = alpha * sigma2
        return (jax.lax.stop_gradient(sigma2.reshape(n, self.n_tasks)),
                jax.lax.stop_gradient(yminusmu.reshape(n, self.n_tasks)))

    # -- introspection -------------------------------------------------------------
    def kernel_cond(self):
        """Condition number of the full (n·T, n·T) train covariance incl.
        noise — the inherited introspection hook of the reference
        (projected_lmc.py:367-369 via MultitaskGPModel's ExactGPModel base)."""
        x = self.train_x
        Sigma_t = self.likelihood.task_covariance()
        if self.model_type == "ICM":
            cov = KronCov(self.covar_module(x)[0], self.task_covar_matrix(),
                          Sigma_t)
        else:
            St = Sigma_t + jnp.diag(self._lmc_extra_diag())
            cov = SumKronRank1Cov(self.covar_module(x),
                                  self.covar_factor[..., 0].T, St)
        return jnp.linalg.cond(cov.dense())

    def lscales(self, unpacked: bool = True):
        """(projected_lmc.py:507-552) — n_latents × dims lengthscales."""
        cm = self.covar_module
        if hasattr(cm, "kernels"):
            scales = [np.squeeze(np.asarray(k.lengthscale)) for k in cm.kernels]
        else:
            scales = np.squeeze(np.asarray(cm.lengthscale), axis=-2)
            if self.model_type == "ICM":
                scales = np.repeat(scales, self.n_latents, axis=0)
            return scales if unpacked else [scales]
        return scales

    def outputscale(self, unpacked: bool = False):
        cm = self.covar_module
        if hasattr(cm, "outputscale"):
            res = np.asarray(cm.outputscale)[:, None]
        elif hasattr(cm, "kernels"):
            res = np.stack([np.asarray(k.outputscale) for k in cm.kernels], axis=1)
        else:
            res = np.ones((self.n_latents, 1))
        return res.squeeze() if unpacked else res


class _MeanVarMT(Module):
    """Multitask prediction carrying exact mean and variance diagonals."""

    def __init__(self, mean, var):
        self.mean = jnp.asarray(mean)
        self._var = jnp.asarray(var)

    @property
    def variance(self):
        return self._var

    @property
    def stddev(self):
        return jnp.sqrt(self._var)

    def confidence_region(self, k: float = 2.0):
        s = self.stddev
        return self.mean - k * s, self.mean + k * s
