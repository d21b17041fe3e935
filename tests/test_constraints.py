"""Constraint transforms & matrix parametrizations (projected_lmc.py:207-258).

Covers every transform in constraints.py: the scalar bijectors
(Positive/GreaterThan/Interval), the four matrix parametrizations the models
use (ScalarParam / PositiveDiagonalParam / UpperTriangularParam /
LowerTriangularParam analogs) and their right-inverses, plus an end-to-end
check that a custom noise constraint threads through GaussianLikelihood.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from projected_lmc_tpu import constraints as C
from projected_lmc_tpu.likelihoods import GaussianLikelihood


# -- scalar bijectors ---------------------------------------------------------

@pytest.mark.parametrize("con", [C.Positive(), C.GreaterThan(1e-3),
                                 C.Interval(0.1, 2.5)])
def test_bijector_round_trip(con):
    y = jnp.asarray([0.15, 0.5, 1.7])
    x = con.inverse(y)
    np.testing.assert_allclose(np.asarray(con.forward(x)), np.asarray(y),
                               rtol=1e-6)


def test_interval_bounds_and_monotonicity():
    con = C.Interval(0.5, 3.0)
    x = jnp.linspace(-20, 20, 101)
    y = np.asarray(con.forward(x))
    assert (y > 0.5).all() and (y < 3.0).all()
    assert (np.diff(y) >= 0).all()


def test_greater_than_floor():
    con = C.GreaterThan(0.25)
    assert float(con.forward(jnp.asarray(-50.0))) >= 0.25


# -- matrix parametrizations --------------------------------------------------

def test_scalar_param():
    raw = jnp.asarray([1.0, 3.0, 5.0])
    out = C.scalar_param(raw, bounds=(-2.0, 2.0))
    np.testing.assert_allclose(np.asarray(out), 2.0)  # mean 3 clamps to 2
    out2 = C.scalar_param(raw, bounds=(-10.0, 10.0))
    np.testing.assert_allclose(np.asarray(out2), 3.0)


def test_positive_diagonal_param_round_trip():
    rng = np.random.default_rng(0)
    target = jnp.asarray(np.diag(rng.uniform(0.1, 2.0, 4)))
    raw = C.positive_diagonal_param_inverse(target)
    out = C.positive_diagonal_param(raw)
    np.testing.assert_allclose(np.asarray(out), np.asarray(target), rtol=1e-6)
    # off-diagonals of the output are exactly zero whatever raw holds
    noisy = raw + jnp.asarray(rng.standard_normal((4, 4)) * jnp.tril(jnp.ones((4, 4)), -1))
    out2 = C.positive_diagonal_param(noisy)
    assert np.allclose(np.asarray(out2 - jnp.diag(jnp.diagonal(out2))), 0.0)


def test_upper_triangular_param_round_trip():
    rng = np.random.default_rng(1)
    M = np.triu(rng.standard_normal((5, 5)))
    M[range(5), range(5)] = np.abs(M.diagonal()) + 0.1
    target = jnp.asarray(M)
    raw = C.upper_triangular_param_inverse(target)
    out = C.upper_triangular_param(raw)
    np.testing.assert_allclose(np.asarray(out), np.asarray(target), rtol=1e-6)
    assert np.allclose(np.tril(np.asarray(out), -1), 0.0)


def test_lower_triangular_param_round_trip():
    rng = np.random.default_rng(2)
    M = np.tril(rng.standard_normal((5, 5)))
    M[range(5), range(5)] = np.abs(M.diagonal()) + 0.1
    target = jnp.asarray(M)
    raw = C.lower_triangular_param_inverse(target)
    out = C.lower_triangular_param(raw)
    np.testing.assert_allclose(np.asarray(out), np.asarray(target), rtol=1e-6)
    assert np.allclose(np.triu(np.asarray(out), 1), 0.0)
    # clamp bounds bite on the diagonal
    big = C.lower_triangular_param(raw, bounds=(-0.5, 0.5))
    d = np.diag(np.asarray(big))
    assert (d <= np.exp(0.5) + 1e-6).all() and (d >= np.exp(-0.5) - 1e-6).all()


# -- end-to-end: custom constraint through a likelihood -----------------------

def test_interval_noise_constraint_in_likelihood():
    lik = GaussianLikelihood(batch_shape=3,
                             noise_constraint=C.Interval(1e-3, 1.0),
                             noise_init=0.1)
    noise = np.asarray(lik.noise)
    np.testing.assert_allclose(noise, 0.1, rtol=1e-5)
    # gradient flows through the transform and respects the bounds
    g = jax.grad(lambda raw: jnp.sum(
        lik.replace(raw_noise=raw).noise))(lik.raw_noise)
    assert np.isfinite(np.asarray(g)).all() and (np.asarray(g) > 0).all()
    hi = lik.replace(raw_noise=jnp.full_like(lik.raw_noise, 100.0))
    assert (np.asarray(hi.noise) < 1.0 + 1e-6).all()
