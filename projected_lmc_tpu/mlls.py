"""Marginal log-likelihood objectives.

Counterparts of the reference's loss layer: gpytorch's
ExactMarginalLogLikelihood, the custom ``ProjectedLMCmll``
(projected_lmc.py:1158-1241, term for term), and the LOO pseudo-likelihood
(projected_lmc.py:86-105). Each objective is a pure function of the model
pytree, jit/grad-ready; training loops differentiate ``loss = -mll(model)``.
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp

from .models.exact import ExactGPModel
from .models.projected import ProjectedGPModel


def exact_mll(model, x=None, y=None):
    """Exact MLL scaled by 1/num_data (gpytorch ExactMarginalLogLikelihood)."""
    return model.mll(x=x, y=y)


def projected_lmc_mll(model: ProjectedGPModel, with_terms: bool = False):
    """The ProjectedLMCmll loss (projected_lmc.py:1178-1241).

    latent term:  (1/n)·Σ_b log N(T(Y)_b ; 0, K_b + σ_b² I)
    projection terms (kept individually for diagnostics, :1206-1207):
      [0] −½·2·Σ log diag(B̃^{1/2})
      [1] −½·‖B̃^{-1/2} Q⊥ᵀ Y‖² / n   (scalar_B∧BDN fast path uses the cached
          ‖Y‖² − ‖YQ‖² identity, :1215)
      [2] −½·Σ log R_ii²
    plus the constant −½ (p−q) log 2π.
    """
    Y = model.train_y_tasks
    n = Y.shape[0]
    p, q = model.n_tasks, model.n_latents

    proj_target = model.project_data(Y)                       # (q, n)
    latent_ll = jnp.sum(model.log_marginal(y=proj_target, orientation="tn"))
    latent_res = (latent_ll + model.covar_module.prior_log_prob()) / n

    terms = [jnp.zeros(()), jnp.zeros(()), jnp.zeros(())]
    Q, R, Q_orth = model.lmc_coefficients.QR()

    if model.BDN and model.scalar_B:
        if model.log_B_tilde_raw.size > 0:
            log_B = model.log_B_tilde
            B_inv_val = jnp.exp(-log_B[0])
            log_B_root_diag = log_B / 2
            YQ = jnp.matmul(Y, Q, precision=jax.lax.Precision.HIGHEST)
            terms[1] = -0.5 * B_inv_val * (model.Y_squared_norm
                                           - jnp.sum(YQ**2)) / n
        else:
            log_B_root_diag = jnp.zeros((1,), Y.dtype)
    else:
        if model.diagonal_B:
            log_B = model.log_B_tilde
            log_B_root_diag = log_B / 2
            rot = jnp.matmul(Y, Q_orth, precision=jax.lax.Precision.HIGHEST)
            disc = jnp.sum((rot * jnp.exp(-log_B)[None, :]) * rot)
        else:
            Binv_chol = model.B_tilde_inv_chol
            k = p - q
            idx = jnp.arange(k)
            log_B_root_diag = -jnp.log(jnp.diagonal(Binv_chol))
            root = jnp.matmul(jnp.matmul(Y, Q_orth, precision=jax.lax.Precision.HIGHEST),
                              Binv_chol, precision=jax.lax.Precision.HIGHEST)
            disc = jnp.sum(root * root)
        terms[1] = -0.5 * disc / n

    terms[0] = -0.5 * 2.0 * jnp.sum(log_B_root_diag)
    if model.lmc_coefficients.bulk:
        idxq = jnp.arange(q)
        terms[2] = -0.5 * jnp.sum(jnp.log(R[idxq, idxq] ** 2))
    else:
        terms[2] = -0.5 * 2.0 * model.lmc_coefficients.r_raw_diag_sum()

    projection_term = terms[0] + terms[1] + terms[2] - 0.5 * (p - q) * math.log(2 * math.pi)
    res = latent_res + projection_term
    if with_terms:
        return res, terms
    return res


def loo_pseudo_likelihood(model: ExactGPModel, targets=None):
    """LOO pseudo-likelihood MLL (projected_lmc.py:86-105):
    (1/n)·Σᵢ [−½ log σᵢ² − ½ (yᵢ−μᵢ)²/σᵢ²] − ½ log 2π, using the model's
    compute_loo identities."""
    sigma2, yminusmu = model.compute_loo() if targets is None \
        else model.compute_loo(targets=targets)
    term1 = -0.5 * jnp.log(sigma2)
    term2 = -0.5 * yminusmu**2 / sigma2
    res = jnp.sum(term1 + term2, axis=0)       # sum over points
    num_data = sigma2.shape[0]
    return jnp.sum(res) / num_data - 0.5 * math.log(2 * math.pi)
