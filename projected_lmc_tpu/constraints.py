"""Parameter constraints as bijective transforms.

gpytorch stores ``raw_*`` parameters and maps them through constraint objects
(softplus by default); the reference relies on this for noise floors such as
``GreaterThan(np.exp(noise_thresh))`` (projected_lmc.py:920-921). Here the same
idea is expressed as pure functions: models store raw arrays and apply these
transforms in their property accessors, so gradients flow through the transform
exactly as in the reference.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def softplus(x):
    return jax.nn.softplus(x)


def inv_softplus(y):
    # stable inverse of softplus: log(exp(y) - 1)
    y = jnp.asarray(y)
    return y + jnp.log(-jnp.expm1(-y))


class _ValueEq:
    """Value equality/hash by __dict__: constraints live in Module pytrees'
    STATIC aux data, where identity-based equality makes two semantically
    identical models compare as different treedefs — causing spurious jit
    retraces and breaking same-config batching (training.fit_ensemble)."""

    def __eq__(self, other):
        return type(self) is type(other) and self.__dict__ == other.__dict__

    def __hash__(self):
        return hash((type(self).__name__, tuple(sorted(self.__dict__.items()))))


class Positive(_ValueEq):
    """y = softplus(x); matches gpytorch's default Positive constraint."""

    def forward(self, x):
        return softplus(x)

    def inverse(self, y):
        return inv_softplus(y)


class GreaterThan(_ValueEq):
    """y = softplus(x) + lower_bound (gpytorch GreaterThan)."""

    def __init__(self, lower_bound: float):
        self.lower_bound = float(lower_bound)

    def forward(self, x):
        return softplus(x) + self.lower_bound

    def inverse(self, y):
        return inv_softplus(jnp.maximum(y - self.lower_bound, 1e-20))


class Interval(_ValueEq):
    """y = lower + (upper-lower)*sigmoid(x) (gpytorch Interval)."""

    def __init__(self, lower: float, upper: float):
        self.lower, self.upper = float(lower), float(upper)

    def forward(self, x):
        return self.lower + (self.upper - self.lower) * jax.nn.sigmoid(x)

    def inverse(self, y):
        t = (y - self.lower) / (self.upper - self.lower)
        t = jnp.clip(t, 1e-12, 1 - 1e-12)
        return jnp.log(t) - jnp.log1p(-t)


# ---------------------------------------------------------------------------
# Matrix parametrizations — JAX analogs of the torch.nn.utils.parametrize
# modules at projected_lmc.py:207-258. Each maps a raw (unconstrained) matrix
# to a constrained one; ``inverse`` initializes the raw matrix from a target.
# ---------------------------------------------------------------------------

def scalar_param(raw, bounds=(-1e16, 1e16)):
    """Scalar matrix: every entry = clamp(mean(raw), bounds). (ScalarParam, :207-218)"""
    return jnp.ones_like(raw) * jnp.clip(jnp.mean(raw), bounds[0], bounds[1])


def positive_diagonal_param(raw):
    """diag(exp(diag(raw))). (PositiveDiagonalParam, :220-227)"""
    d = jnp.diagonal(raw, axis1=-2, axis2=-1)
    return jnp.zeros_like(raw).at[..., jnp.arange(raw.shape[-1]), jnp.arange(raw.shape[-1])].set(jnp.exp(d))


def positive_diagonal_param_inverse(mat):
    d = jnp.diagonal(mat, axis1=-2, axis2=-1)
    n = mat.shape[-1]
    return jnp.zeros_like(mat).at[..., jnp.arange(n), jnp.arange(n)].set(jnp.log(d))


def upper_triangular_param(raw, bounds=None):
    """triu(raw) with exp() diagonal. (UpperTriangularParam, :229-240)"""
    upper = jnp.triu(raw)
    d = jnp.diagonal(raw, axis1=-2, axis2=-1)
    if bounds is not None:
        d = jnp.clip(d, bounds[0], bounds[1])
    n = raw.shape[-1]
    idx = jnp.arange(n)
    return upper.at[..., idx, idx].set(jnp.exp(d))


def upper_triangular_param_inverse(mat):
    n = mat.shape[-1]
    idx = jnp.arange(n)
    d = jnp.diagonal(mat, axis1=-2, axis2=-1)
    return jnp.asarray(mat).at[..., idx, idx].set(jnp.log(d))


def lower_triangular_param(raw, bounds=(-1e16, 1e16)):
    """tril(raw) with exp(clamp(diag)) diagonal — Cholesky-factor param.
    (LowerTriangularParam, :242-258)"""
    lower = jnp.tril(raw)
    n = raw.shape[-1]
    idx = jnp.arange(n)
    d = jnp.clip(jnp.diagonal(raw, axis1=-2, axis2=-1), bounds[0], bounds[1])
    return lower.at[..., idx, idx].set(jnp.exp(d))


def lower_triangular_param_inverse(mat):
    n = mat.shape[-1]
    idx = jnp.arange(n)
    d = jnp.diagonal(mat, axis1=-2, axis2=-1)
    return jnp.asarray(mat).at[..., idx, idx].set(jnp.log(d))
