"""Jit-stable PSD-safe Cholesky with escalating jitter and a custom VJP.

The reference retries failed factorizations in Python ``try/except`` loops with
×10 jitter escalation (projected_lmc.py:397-404, :1063-1072) and through
``gpytorch.settings.cholesky_max_tries``. That control flow cannot exist under
``jax.jit``; here the ladder is a ``lax.while_loop`` — XLA traces it once and the
hardware loops. A failed TPU Cholesky returns NaNs rather than raising, which is
exactly the loop predicate.

Gradients: ``lax.while_loop`` is not reverse-differentiable, so ``safe_cholesky``
carries a custom VJP implementing the standard Cholesky pullback
(L^{-T} Φ(Lᵀ L̄) L^{-1} with Φ = tril, half diagonal), computed from the saved
factor with two triangular solves — no re-factorization in the backward pass.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax import lax

# Matches gpytorch.settings.cholesky_jitter defaults: 1e-6 (float32) / 1e-8 (float64).
_BASE_JITTER = {jnp.dtype(jnp.float32): 1e-6, jnp.dtype(jnp.float64): 1e-8,
                jnp.dtype(jnp.bfloat16): 1e-3}
MAX_TRIES = 8  # gp.settings.cholesky_max_tries(8) used throughout experiments.py:265,312


def _base_jitter(dtype) -> float:
    return _BASE_JITTER.get(jnp.dtype(dtype), 1e-6)


def _chol_ok(L):
    # reduce over the matrix dims only, keep batch dims
    return jnp.all(jnp.isfinite(L), axis=(-2, -1))


def _jittered_cholesky(A, max_tries: int):
    """while_loop jitter ladder; returns (L, jitter_used)."""
    n = A.shape[-1]
    eye = jnp.eye(n, dtype=A.dtype)
    base = _base_jitter(A.dtype)

    L0 = jnp.linalg.cholesky(A)
    ok0 = jnp.all(_chol_ok(L0))

    def cond(state):
        _, ok, tries, _ = state
        return jnp.logical_and(jnp.logical_not(ok), tries < max_tries)

    def body(state):
        _, _, tries, jitter = state
        jitter = jnp.where(tries == 0, base, jitter * 10.0)
        L = jnp.linalg.cholesky(A + jitter * eye)
        return L, jnp.all(_chol_ok(L)), tries + 1, jitter

    L, ok, tries, jitter = lax.while_loop(
        cond, body, (L0, ok0, jnp.array(0, jnp.int32), jnp.array(0.0, A.dtype)))
    return L, jitter


@partial(jax.custom_vjp, nondiff_argnums=(1,))
def safe_cholesky(A, max_tries: int = MAX_TRIES):
    """Lower-triangular Cholesky factor of ``A`` (+ escalating jitter on failure).

    Batched over leading dimensions. Under jit the retry ladder runs on-device.
    """
    L, _ = _jittered_cholesky(A, max_tries)
    return L


def safe_cholesky_with_jitter(A, max_tries: int = MAX_TRIES):
    """Like :func:`safe_cholesky` but also returns the jitter used (no grad)."""
    L, jitter = _jittered_cholesky(lax.stop_gradient(A), max_tries)
    n = A.shape[-1]
    L = safe_cholesky(A + lax.stop_gradient(jitter) * jnp.eye(n, dtype=A.dtype), 1)
    return L, jitter


def _phi(X):
    """tril with halved diagonal — the Cholesky pullback projector."""
    return jnp.tril(X) - 0.5 * jnp.tril(jnp.triu(X))


def _safe_cholesky_fwd(A, max_tries):
    L, _ = _jittered_cholesky(A, max_tries)
    return L, L


def _safe_cholesky_bwd(max_tries, L, L_bar):
    # standard pullback A_bar = L^{-T} Φ(Lᵀ L̄) L^{-1}, then symmetrized (valid since
    # every caller constructs A symmetrically)
    P = _phi(jnp.swapaxes(L, -1, -2) @ L_bar)
    X = jax.scipy.linalg.solve_triangular(jnp.swapaxes(L, -1, -2), P, lower=False)
    A_bar = jax.scipy.linalg.solve_triangular(
        jnp.swapaxes(L, -1, -2),
        jnp.swapaxes(X, -1, -2), lower=False)
    A_bar = jnp.swapaxes(A_bar, -1, -2)
    A_bar = 0.5 * (A_bar + jnp.swapaxes(A_bar, -1, -2))
    return (A_bar,)


safe_cholesky.defvjp(_safe_cholesky_fwd, _safe_cholesky_bwd)


# ---------------------------------------------------------------------------
# Solves / logdet built on the factor
# ---------------------------------------------------------------------------

def solve_triangular(L, B, *, lower=True, trans=False):
    """Batched triangular solve (wraps lapack/XLA TriangularSolve)."""
    return jax.scipy.linalg.solve_triangular(L, B, lower=lower, trans=1 if trans else 0)


def cho_solve(L, B):
    """Solve (L Lᵀ) X = B given lower factor L; batched."""
    Y = jax.scipy.linalg.solve_triangular(L, B, lower=True)
    return jax.scipy.linalg.solve_triangular(jnp.swapaxes(L, -1, -2), Y, lower=False)


def logdet_from_chol(L):
    """log det(L Lᵀ) = 2 Σ log diag(L); batched."""
    d = jnp.diagonal(L, axis1=-2, axis2=-1)
    return 2.0 * jnp.sum(jnp.log(d), axis=-1)


def chol_inverse_diag(L):
    """diag((L Lᵀ)^{-1}) via full inverse of the factor; batched.

    Used by the exact LOO identities σᵢ² = 1/[K⁻¹]ᵢᵢ (projected_lmc.py:371-436).
    """
    n = L.shape[-1]
    eye = jnp.eye(n, dtype=L.dtype)
    Linv = jax.scipy.linalg.solve_triangular(L, jnp.broadcast_to(eye, L.shape), lower=True)
    return jnp.sum(Linv * Linv, axis=-2)


def add_jitter(A, jitter):
    n = A.shape[-1]
    return A + jitter * jnp.eye(n, dtype=A.dtype)


def symmetrize(A):
    return 0.5 * (A + jnp.swapaxes(A, -1, -2))
