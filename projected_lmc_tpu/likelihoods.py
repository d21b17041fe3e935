"""Gaussian likelihoods (batched and multitask).

JAX equivalents of the gpytorch likelihoods the reference relies on:
``GaussianLikelihood(batch_shape=[q])`` for the projected model's latent noises
(projected_lmc.py:916-921) and ``MultitaskGaussianLikelihood(num_tasks=p, rank=r)``
for ICM/variational models and for the reconstructed full task noise
(projected_lmc.py:1023-1074). Likelihoods expose their noise covariance; the
marginalization math lives with the distribution structures in mlls/models.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from .module import Module
from . import constraints


class GaussianLikelihood(Module):
    """Batched homoskedastic Gaussian likelihood. ``noise`` has shape (batch, 1),
    matching gpytorch's convention (so ``projected_noise`` squeezes -1)."""

    def __init__(self, batch_shape=1, noise_constraint=None, noise_init=None,
                 dtype=jnp.float32):
        self.batch = int(batch_shape)
        self.constraint = noise_constraint or constraints.GreaterThan(1e-4)
        if noise_init is None:
            # gpytorch default: raw_noise = 0
            self.raw_noise = jnp.zeros((self.batch, 1), dtype)
        else:
            self.raw_noise = jnp.broadcast_to(
                self.constraint.inverse(jnp.asarray(noise_init, dtype)),
                (self.batch, 1)).astype(dtype)

    @property
    def noise(self):
        return self.constraint.forward(self.raw_noise)

    def set_noise(self, value):
        value = jnp.broadcast_to(jnp.asarray(value, self.raw_noise.dtype),
                                 self.raw_noise.shape)
        return self.replace(raw_noise=self.constraint.inverse(value))

    def add_to_covar(self, K):
        """K: (batch, n, n) -> K + noise·I per batch element."""
        n = K.shape[-1]
        return K + self.noise[..., None] * jnp.eye(n, dtype=K.dtype)


class MultitaskGaussianLikelihood(Module):
    """Multitask noise Σt = F Fᵀ (+ diag task_noises) (+ σ²_global I), p×p.

    Mirrors gpytorch's MultitaskGaussianLikelihood(num_tasks, rank,
    has_global_noise, has_task_noise). With rank=0 the task noise is diagonal.
    """

    def __init__(self, num_tasks: int, rank: int = 0, has_global_noise: bool = True,
                 has_task_noise: bool = True, noise_constraint=None, seed: int = 0,
                 dtype=jnp.float32):
        self.num_tasks = int(num_tasks)
        self.rank = int(rank)
        self.has_global_noise = bool(has_global_noise)
        self.has_task_noise = bool(has_task_noise)
        self.constraint = noise_constraint or constraints.GreaterThan(1e-4)
        rng = np.random.default_rng(seed)
        if self.has_global_noise:
            self.raw_noise = jnp.zeros((1,), dtype)
        if self.has_task_noise:
            if self.rank > 0:
                self.task_noise_covar_factor = jnp.asarray(
                    rng.standard_normal((self.num_tasks, self.rank)), dtype)
            else:
                self.raw_task_noises = jnp.zeros((self.num_tasks,), dtype)

    @property
    def noise(self):
        if not self.has_global_noise:
            return jnp.zeros((1,), jnp.float32)
        return self.constraint.forward(self.raw_noise)

    @property
    def task_noises(self):
        if not (self.has_task_noise and self.rank == 0):
            raise AttributeError("task_noises only defined for rank=0 likelihoods")
        return self.constraint.forward(self.raw_task_noises)

    def set_noise(self, value):
        return self.replace(raw_noise=self.constraint.inverse(
            jnp.broadcast_to(jnp.asarray(value, self.raw_noise.dtype), (1,))))

    def task_covariance(self):
        """Dense p×p noise covariance Σt."""
        p = self.num_tasks
        dt = self.raw_noise.dtype if self.has_global_noise else \
            (self.task_noise_covar_factor.dtype if self.rank > 0 else self.raw_task_noises.dtype)
        sigma = jnp.zeros((p, p), dt)
        if self.has_task_noise:
            if self.rank > 0:
                F = self.task_noise_covar_factor
                sigma = sigma + F @ F.T
            else:
                sigma = sigma + jnp.diag(self.task_noises)
        if self.has_global_noise:
            sigma = sigma + self.noise[0] * jnp.eye(p, dtype=dt)
        return sigma

    def with_task_covar_factor(self, L):
        """Set F directly (used by ProjectedGPModel.full_likelihood to install
        the Cholesky factor of the reconstructed Σ, projected_lmc.py:1068)."""
        return self.replace(task_noise_covar_factor=jnp.asarray(L))


class FixedTaskNoise(Module):
    """A fully specified (observed) p×p task noise covariance with no free
    parameters — what ``full_likelihood`` returns in spirit: a rank-p multitask
    Gaussian noise given by an explicit Cholesky factor."""

    _buffers_ = ("chol",)

    def __init__(self, chol):
        self.chol = jnp.asarray(chol)
        self.num_tasks = int(chol.shape[-1])

    def task_covariance(self):
        return self.chol @ self.chol.T

    @property
    def task_noise_covar_factor(self):
        return self.chol
