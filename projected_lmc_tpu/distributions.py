"""Multivariate-normal distributions with structure-aware covariances.

Replaces gpytorch's MultivariateNormal / MultitaskMultivariateNormal +
linear_operator lazy tensors. gpytorch defers structure exploitation to a
general lazy-evaluation engine; here each covariance structure the framework
actually produces is a small explicit class with exact TPU-friendly solvers:

  * DenseCov          — (m, m) dense (small problems / tests)
  * BatchIndepCov     — (t, n, n) batch-independent tasks (``from_batch_mvn``)
  * KronCov           — K ⊗ B (exact ICM prior)
  * SumKronRank1Cov   — Σ_b K_b ⊗ h_b h_bᵀ (LMC prior / projected-LMC posterior)

Task layout is gpytorch-interleaved: vec index (point i, task t) = i·T + t.
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp

from .module import Module
from .ops.cholesky import safe_cholesky, solve_triangular, logdet_from_chol
from .ops import kron as kron_ops
from .ops import woodbury as wb_ops

_HIGHEST = jax.lax.Precision.HIGHEST


class MultivariateNormal(Module):
    """(Batched) dense-covariance MVN: mean (..., n), covariance (..., n, n)."""

    def __init__(self, mean, covariance):
        self.mean = jnp.asarray(mean)
        self.covariance_matrix = jnp.asarray(covariance)

    @property
    def variance(self):
        return jnp.diagonal(self.covariance_matrix, axis1=-2, axis2=-1)

    @property
    def stddev(self):
        return jnp.sqrt(self.variance)

    @property
    def batch_shape(self):
        return self.mean.shape[:-1]

    @property
    def event_shape(self):
        return self.mean.shape[-1:]

    def log_prob(self, value):
        """Batched Gaussian log-density; value (..., n)."""
        n = self.mean.shape[-1]
        delta = value - self.mean
        L = safe_cholesky(self.covariance_matrix)
        z = solve_triangular(L, delta[..., None], lower=True)[..., 0]
        quad = jnp.sum(z * z, axis=-1)
        return -0.5 * (quad + logdet_from_chol(L) + n * math.log(2 * math.pi))

    def confidence_region(self, k: float = 2.0):
        s = self.stddev
        return self.mean - k * s, self.mean + k * s

    def add_noise_diag(self, noise):
        """Returns a new MVN with `noise` added to the covariance diagonal
        (noise broadcastable to (..., n) or scalar)."""
        n = self.mean.shape[-1]
        eye = jnp.eye(n, dtype=self.covariance_matrix.dtype)
        cov = self.covariance_matrix + jnp.asarray(noise)[..., None] * eye
        return MultivariateNormal(self.mean, cov)

    def sample(self, key, sample_shape=()):
        L = safe_cholesky(self.covariance_matrix)
        shape = tuple(sample_shape) + self.mean.shape
        eps = jax.random.normal(key, shape, self.mean.dtype)
        return self.mean + jnp.squeeze(L @ eps[..., None], -1)


# ---------------------------------------------------------------------------
# Covariance structures for multitask distributions
# ---------------------------------------------------------------------------

class DenseCov(Module):
    """Dense (n·t, n·t) interleaved covariance."""

    def __init__(self, matrix, n, t):
        self.matrix = jnp.asarray(matrix)
        self.n, self.t = int(n), int(t)

    def diag(self):
        return jnp.diagonal(self.matrix).reshape(self.n, self.t)

    def dense(self):
        return self.matrix

    def log_prob_centered(self, delta):
        L = safe_cholesky(self.matrix)
        z = solve_triangular(L, delta.reshape(-1), lower=True)
        return -0.5 * (jnp.sum(z * z) + logdet_from_chol(L)
                       + self.n * self.t * math.log(2 * math.pi))


class BatchIndepCov(Module):
    """Block covariance of t independent tasks: covs (t, n, n)."""

    def __init__(self, covs):
        self.covs = jnp.asarray(covs)
        self.t, self.n = self.covs.shape[0], self.covs.shape[-1]

    def diag(self):
        return jnp.diagonal(self.covs, axis1=-2, axis2=-1).T  # (n, t)

    def dense(self):
        n, t = self.n, self.t
        out = jnp.zeros((n * t, n * t), self.covs.dtype)
        ii = jnp.arange(n)
        for task in range(t):
            idx = ii * t + task
            out = out.at[jnp.ix_(idx, idx)].set(self.covs[task])
        return out

    def log_prob_centered(self, delta):
        # delta (n, t) -> per-task independent Gaussians
        L = safe_cholesky(self.covs)
        z = solve_triangular(L, delta.T[..., None], lower=True)[..., 0]
        quad = jnp.sum(z * z)
        return -0.5 * (quad + jnp.sum(logdet_from_chol(L))
                       + self.n * self.t * math.log(2 * math.pi))


class KronCov(Module):
    """K ⊗ B (+ optional I ⊗ Σt noise): the exact ICM covariance."""

    def __init__(self, K, B, Sigma_t=None):
        self.K = jnp.asarray(K)
        self.B = jnp.asarray(B)
        self.Sigma_t = None if Sigma_t is None else jnp.asarray(Sigma_t)
        self.n, self.t = self.K.shape[-1], self.B.shape[-1]

    def diag(self):
        d = jnp.diagonal(self.K)[:, None] * jnp.diagonal(self.B)[None, :]
        if self.Sigma_t is not None:
            d = d + jnp.diagonal(self.Sigma_t)[None, :]
        return d

    def dense(self):
        out = jnp.kron(self.K, self.B)
        if self.Sigma_t is not None:
            out = out + jnp.kron(jnp.eye(self.n, dtype=out.dtype), self.Sigma_t)
        return out

    def with_noise(self, Sigma_t):
        return KronCov(self.K, self.B, Sigma_t)

    def log_prob_centered(self, delta):
        if self.Sigma_t is None:
            raise ValueError("Kronecker log_prob requires task noise (singular otherwise)")
        return kron_ops.icm_log_prob(self.K, self.B, self.Sigma_t, delta)


class SumKronRank1Cov(Module):
    """Σ_b K_b ⊗ h_b h_bᵀ (+ optional I ⊗ Σt): LMC prior & projected posterior."""

    def __init__(self, Ks, H, Sigma_t=None):
        self.Ks = jnp.asarray(Ks)        # (q, n, n)
        self.H = jnp.asarray(H)          # (t, q)
        self.Sigma_t = None if Sigma_t is None else jnp.asarray(Sigma_t)
        self.n, self.t = self.Ks.shape[-1], self.H.shape[0]

    def diag(self):
        kd = jnp.diagonal(self.Ks, axis1=-2, axis2=-1)        # (q, n)
        d = jnp.matmul(kd.T, (self.H * self.H).T, precision=_HIGHEST)  # (n, t)
        if self.Sigma_t is not None:
            d = d + jnp.diagonal(self.Sigma_t)[None, :]
        return d

    def dense(self):
        out = jnp.zeros((self.n * self.t, self.n * self.t), self.Ks.dtype)
        for b in range(self.Ks.shape[0]):
            hb = self.H[:, b]
            out = out + jnp.kron(self.Ks[b], jnp.outer(hb, hb))
        if self.Sigma_t is not None:
            out = out + jnp.kron(jnp.eye(self.n, dtype=out.dtype), self.Sigma_t)
        return out

    def with_noise(self, Sigma_t):
        return SumKronRank1Cov(self.Ks, self.H, Sigma_t)

    def log_prob_centered(self, delta):
        if self.Sigma_t is None:
            raise ValueError("LMC log_prob requires task noise (singular otherwise)")
        return wb_ops.lmc_log_prob(self.Ks, self.H, self.Sigma_t, delta)


class MultitaskMultivariateNormal(Module):
    """Multitask MVN: mean (n, t) + one of the structured covariances above."""

    def __init__(self, mean, covar):
        self.mean = jnp.asarray(mean)
        self.covar = covar

    @classmethod
    def from_batch_mvn(cls, mvn: MultivariateNormal):
        """Batch (t, n) independent MVN -> multitask (projected_lmc.py:317-319)."""
        return cls(mvn.mean.T, BatchIndepCov(mvn.covariance_matrix))

    @property
    def variance(self):
        return self.covar.diag()

    @property
    def stddev(self):
        return jnp.sqrt(self.variance)

    def log_prob(self, Y):
        return self.covar.log_prob_centered(jnp.asarray(Y) - self.mean)

    def confidence_region(self, k: float = 2.0):
        s = self.stddev
        return self.mean - k * s, self.mean + k * s

    def to_dense(self) -> MultivariateNormal:
        return MultivariateNormal(self.mean.reshape(-1), self.covar.dense())
