"""Kronecker joint-diagonalization solvers for exact ICM.

The ICM covariance is K ⊗ B + I_n ⊗ Σt (task-interleaved layout, as in
gpytorch's MultitaskMultivariateNormal). gpytorch evaluates its MLL either by
CG+Lanczos or by symeig of the Kronecker factors; here we always use the exact
joint diagonalization — two small eigendecompositions (n×n and t×t) replace any
O((nt)³) factorization:

    K ⊗ B + I ⊗ Σt = (I⊗Rt)(U⊗V)(Λ⊗Γ + I)(U⊗V)ᵀ(I⊗Rt)ᵀ

with Σt = Rt Rtᵀ, K = U Λ Uᵀ, Rt⁻¹ B Rt⁻ᵀ = V Γ Vᵀ. Everything else is MXU
matmuls. This is also the machinery behind ``MultitaskGPModel.compute_var``
(projected_lmc.py:591-640), implemented here without the psutil/VRAM probing —
batching is a static chunk size chosen at trace time.
"""

from __future__ import annotations

import math
from functools import partial

import jax
import jax.numpy as jnp

from .cholesky import safe_cholesky, solve_triangular, logdet_from_chol, symmetrize

_HIGHEST = jax.lax.Precision.HIGHEST


def _mm(a, b):
    return jnp.matmul(a, b, precision=_HIGHEST)


def icm_eig_factors(K, B, Sigma_t, jitter: float = 1e-8):
    """Joint diagonalization factors of K ⊗ B + I ⊗ Σt.

    Returns dict with Rt (chol Σt), U, lam (eig K), V, gam (eig of whitened B),
    and S = lam⊗gam + 1 as an (n, t) grid.
    """
    n = K.shape[-1]
    t = B.shape[-1]
    Rt = safe_cholesky(Sigma_t)
    # B_tilde = Rt^{-1} B Rt^{-T}
    tmp = solve_triangular(Rt, B, lower=True)
    B_tilde = solve_triangular(Rt, tmp.T, lower=True).T
    gam, V = jnp.linalg.eigh(symmetrize(B_tilde))
    # B̃ ⪰ 0; eigh rounding can dip a hair negative, and with large λmax(K)
    # an S entry λγ+1 could then reach ~0 (Sinv blow-up in the analytic
    # backward, log(S) noise in the forward). Same guard as the chol path.
    gam = jnp.clip(gam, 0.0)
    Kj = K + jitter * jnp.eye(n, dtype=K.dtype)
    lam, U = jnp.linalg.eigh(symmetrize(Kj))
    S = lam[:, None] * gam[None, :] + 1.0
    return dict(Rt=Rt, U=U, lam=lam, V=V, gam=gam, S=S)


def icm_whiten(Y, fac):
    """Z = (U⊗V)ᵀ (I⊗Rt)⁻¹ vec(Y)  computed as Uᵀ (Y Rt⁻ᵀ) V, for Y (n, t)."""
    W = solve_triangular(fac["Rt"], Y.T, lower=True).T     # Y Rt^{-T}
    return _mm(_mm(fac["U"].T, W), fac["V"])


def icm_log_prob(K, B, Sigma_t, Ydelta, jitter: float = 1e-8):
    """log N(vec(Y); 0, K⊗B + I⊗Σt). Exact, O(n³ + t³ + n²t + nt²)."""
    n, t = Ydelta.shape
    fac = icm_eig_factors(K, B, Sigma_t, jitter)
    Z = icm_whiten(Ydelta, fac)
    quad = jnp.sum(Z * Z / fac["S"])
    logdet = n * logdet_from_chol(fac["Rt"]) + jnp.sum(jnp.log(fac["S"]))
    return -0.5 * (quad + logdet + n * t * math.log(2 * math.pi))


@partial(jax.custom_vjp, nondiff_argnums=(4, 5, 6))
def icm_log_prob_chol(K, B, Sigma_t, Ydelta, jitter: float = 1e-8,
                      chol_bf16: bool = False, chol_block: int = 1024):
    """log N(vec(Y); 0, K⊗B + I⊗Σt) via BATCHED CHOLESKY — the training-path
    variant of :func:`icm_log_prob`.

    Only the t×t whitened task covariance is eigendecomposed; the n-sized
    factorizations are t parallel Choleskys of (γ_j K + I):

        K⊗B + I⊗Σt = (I⊗Rt)(I⊗V)[K⊗Γ + I](I⊗V)ᵀ(I⊗Rt)ᵀ

    On TPU a batched (t, n, n) Cholesky runs at MXU rates while an n×n eigh
    is an order of magnitude slower and autodiff-fragile near degenerate
    eigenvalues — per-step MLL cost drops accordingly (the eig path remains
    the right tool for the posterior-variance machinery, where the
    eigenbasis is reused across test chunks).

    ``chol_bf16`` routes the batched factorization through the blocked
    bf16-trailing-update Cholesky (ops/blocked_cholesky.py). Opt-in and
    for training steps on WELL-CONDITIONED operators only (condition
    ≲ 250): on low-rank-dominant + small-ridge spectra the bf16 update
    noise exceeds the trailing Schur complement's scale, and the factor
    degrades to jitter-ladder accuracy (finite, but far from the true
    factor — measured analysis in results/PERF_NOTES.md)."""
    n, t = Ydelta.shape
    Rt = safe_cholesky(Sigma_t)
    tmp = solve_triangular(Rt, B, lower=True)
    B_tilde = solve_triangular(Rt, tmp.T, lower=True).T
    gam, V = jnp.linalg.eigh(symmetrize(B_tilde))          # t×t — cheap
    # B̃ ⪰ 0; eigh noise can dip a hair negative, which would make γK+I
    # indefinite for large λmax(K)
    gam = jnp.clip(gam, 0.0)
    W = solve_triangular(Rt, Ydelta.T, lower=True).T       # Y Rt^{-T}
    Z = _mm(W, V)                                          # (n, t)
    eye = jnp.eye(n, dtype=K.dtype)
    A = gam[:, None, None] * (K + jitter * eye)[None] + eye[None]
    if chol_bf16:
        from .blocked_cholesky import cholesky_bf16_blocked
        L = cholesky_bf16_blocked(A, chol_block)           # batched (t, n, n)
    else:
        L = safe_cholesky(A)                               # batched (t, n, n)
    sol = solve_triangular(L, Z.T[..., None], lower=True)[..., 0]  # (t, n)
    quad = jnp.sum(sol * sol)
    logdet = (n * logdet_from_chol(Rt)
              + 2.0 * jnp.sum(jnp.log(jnp.diagonal(L, axis1=-2, axis2=-1))))
    return -0.5 * (quad + logdet + n * t * math.log(2 * math.pi))


def _icm_chol_fwd(K, B, Sigma_t, Ydelta, jitter, chol_bf16, chol_block):
    ll = icm_log_prob_chol(K, B, Sigma_t, Ydelta, jitter, chol_bf16,
                           chol_block)
    return ll, (K, B, Sigma_t, Ydelta)


def _icm_chol_bwd(jitter, chol_bf16, chol_block, res, g):
    """ANALYTIC gradients of the exact ICM log-prob — no autodiff through
    any eigendecomposition.

    Motivation (round-3 cross-model-consistency diagnosis): the naive
    autodiff backward of the whitening path runs through eigh(B̃), whose
    pullback carries 1/(γ_i − γ_j) factors. With a rank-p noise factor
    (the reference's default q_noise_guess = p, experiments.py:180) B̃'s
    spectrum has a large cluster of near-equal eigenvalues, so those
    factors amplify fp32 rounding into O(1) gradient noise — measured as a
    loss oscillation that stalls ICM training far from the optimum (a
    from-scratch torch oracle with autodiff-through-eigh NaN'd outright on
    the same config; scripts/oracle_icm_synthetic.py). The analytic
    backward uses the eigendecompositions only as FORWARD factorizations:

      d ll/dK  = ½ (A B Aᵀ − U diag(Σ_j γ_j/S_·j) Uᵀ)
      d ll/dB  = ½ (Aᵀ K_j A − P diag(Σ_i λ_i/S_i·) Pᵀ),  P = Rt⁻ᵀ V
      d ll/dΣt = ½ (Aᵀ A − P diag(Σ_i 1/S_i·) Pᵀ)
      d ll/dY  = −A,          A = mat(Σ⁻¹ vec Y),  S = λγᵀ + 1

    — the ½(αᵀ dΣ α − tr(Σ⁻¹ dΣ)) split evaluated exactly in the joint
    eigenbasis (degenerate eigenvalues are harmless: only eigen-PROJECTIONS
    enter, never eigenvector derivatives)."""
    K, B, Sigma_t, Ydelta = res
    # mixed-precision callers exist (e.g. an f32 likelihood on an f64
    # model): compute in the promoted dtype, return cotangents in each
    # primal's own dtype (what autodiff's per-op transpose rules produce)
    ct = jnp.result_type(K.dtype, B.dtype, Sigma_t.dtype, Ydelta.dtype)
    Kp, Bp = K.astype(ct), B.astype(ct)
    Stp, Yp = Sigma_t.astype(ct), Ydelta.astype(ct)
    fac = icm_eig_factors(Kp, Bp, Stp, jitter=jitter)
    A = icm_solve(Yp, fac)                                  # (n, t)
    lam, gam, S = fac["lam"], fac["gam"], fac["S"]
    U, V, Rt = fac["U"], fac["V"], fac["Rt"]
    Sinv = 1.0 / S                                          # (n, t)
    w = _mm(Sinv, gam[:, None])[:, 0]                       # (n,)
    v = _mm(lam[None, :], Sinv)[0]                          # (t,)
    u = jnp.sum(Sinv, axis=0)                               # (t,)
    MK = _mm(U * w[None, :], U.T)
    P = solve_triangular(Rt.T, V, lower=False)              # Rt^{-T} V
    MB = _mm(P * v[None, :], P.T)
    MS = _mm(P * u[None, :], P.T)
    n = K.shape[-1]
    Kj = Kp + jitter * jnp.eye(n, dtype=ct)
    dK = ((0.5 * g) * (_mm(_mm(A, Bp), A.T) - MK)).astype(K.dtype)
    dB = ((0.5 * g) * (_mm(_mm(A.T, Kj), A) - MB)).astype(B.dtype)
    dSt = ((0.5 * g) * (_mm(A.T, A) - MS)).astype(Sigma_t.dtype)
    dY = (-g * A).astype(Ydelta.dtype)
    return dK, dB, dSt, dY


icm_log_prob_chol.defvjp(_icm_chol_fwd, _icm_chol_bwd)


def icm_solve(Ydelta, fac):
    """α with vec(α) = (K⊗B + I⊗Σt)⁻¹ vec(Y); α has shape (n, t)."""
    Z = icm_whiten(Ydelta, fac)
    Zt = Z / fac["S"]
    A = _mm(_mm(fac["U"], Zt), fac["V"].T)
    # (I ⊗ Rt^{-T}): right-multiply by Rt^{-1}: solve Rtᵀ Xᵀ = Aᵀ
    return solve_triangular(fac["Rt"].T, A.T, lower=False).T


def icm_posterior_mean(K_star, B, alpha, mean_star):
    """Posterior mean (n*, t): K_* α B + m(x*)."""
    return _mm(_mm(K_star, alpha), B) + mean_star


def icm_posterior_variance(K_star_diag, K_star_train, B, fac, noise_diag=None,
                           chunk: int = 1024):
    """Posterior variance diag (n*, t) of the ICM model, matching
    MultitaskGPModel.compute_var (projected_lmc.py:591-640):

      first  = diag(K** ⊗ B [+ Σ_noise])
      second[(i,t)] = Σ_{j,s} k̂²[i,j] Ĉ²[t,s] / S[j,s]

    with k̂ = K_*x U and Ĉ = B Rt⁻ᵀ V. Chunked over test points with a static
    chunk size (the TPU replacement of the reference's free-memory probe).
    """
    U, V, Rt, S = fac["U"], fac["V"], fac["Rt"], fac["S"]
    b_diag = jnp.diagonal(B)
    first = K_star_diag[:, None] * b_diag[None, :]
    if noise_diag is not None:
        first = first + noise_diag[None, :]

    C_hat = _mm(solve_triangular(Rt, B, lower=True).T, V)   # B Rt^{-T} V  (t, t)
    C2 = C_hat * C_hat
    M = _mm(C2, (1.0 / S).T)                                 # (t, n)

    n_star = K_star_train.shape[0]
    if n_star <= chunk:
        k_hat = _mm(K_star_train, U)
        second = _mm(k_hat * k_hat, M.T)
    else:
        pad = (-n_star) % chunk
        Kp = jnp.pad(K_star_train, ((0, pad), (0, 0)))
        blocks = Kp.reshape(-1, chunk, Kp.shape[-1])

        def one(Kb):
            kh = _mm(Kb, U)
            return _mm(kh * kh, M.T)

        second = jax.lax.map(one, blocks).reshape(-1, B.shape[-1])[:n_star]
    return jnp.clip(first - second, min=1e-6)
