"""Exact LMC marginal likelihood & posterior via the matrix-determinant lemma.

The naive LMC covariance Σ_b K_b ⊗ h_b h_bᵀ + I_n ⊗ Σt has no Kronecker joint
diagonalization (the K_b differ per latent), so gpytorch falls back to
preconditioned CG + stochastic Lanczos quadrature for its logdet — iterative,
noisy, and poorly suited to the MXU. The TPU-native replacement is a *dense*
exact path built on the structure f = (H ⊗ I) u:

    Cov = D + A G Aᵀ,   D = I_n ⊗ Σt,   G = blockdiag(K_b),   A[(i,t),(b,j)] = H[t,b] δ_ij

With G = L L ᵀ (one batched n×n Cholesky over the q latents) the capacitance

    Cap = I_{qn} + L_Gᵀ (C ⊗ I_n) L_G,   C = Hᵀ Σt⁻¹ H   (q×q)

gives  logdet Cov = n·logdet Σt + logdet Cap  and Woodbury solves — everything
is batched Cholesky + large matmuls, exact and deterministic. Cost
O(q n³ + (qn)³) instead of O(iters · q n² t) CG sweeps with stochastic logdet.
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp

from .cholesky import (safe_cholesky, solve_triangular, cho_solve,
                       logdet_from_chol, add_jitter)

_HIGHEST = jax.lax.Precision.HIGHEST


def _mm(a, b):
    return jnp.matmul(a, b, precision=_HIGHEST)


def lmc_factors(Ks, H, Sigma_t, jitter: float = 1e-6):
    """Precompute the Woodbury factors from dense latent kernels.

    Args:
        Ks: (q, n, n) latent kernel matrices.
        H: (t, q) mixing matrix (columns h_b).
        Sigma_t: (t, t) task noise covariance.
    Returns dict with L_G (q,n,n), Rt, C (q,q), L_cap (qn,qn).
    """
    L_G = safe_cholesky(add_jitter(Ks, jitter))
    return lmc_factors_from_roots(L_G, H, Sigma_t)


def lmc_factors_from_roots(roots, H, Sigma_t):
    """Woodbury factors for Σ = Σ_b (R_b R_bᵀ) ⊗ h_b h_bᵀ + I ⊗ Σt.

    ``roots``: (q, n, r) — the latent-kernel roots. For exact LMC these are
    the n×n Cholesky factors; for the SGPR/Nyström path they are the n×m
    low-rank roots K_xz L_zz⁻ᵀ (gpytorch InducingPointKernel,
    projected_lmc.py:302-303), making the capacitance (qm)×(qm) — tiny.
    Everything downstream (log_prob, solves, posterior) is root-agnostic.
    """
    q, n, r = roots.shape
    L_G = roots
    Rt = safe_cholesky(Sigma_t)
    SinvH = cho_solve(Rt, H)                       # Σt^{-1} H  (t, q)
    C = _mm(H.T, SinvH)                            # (q, q)
    # Assemble Cap = I + blocks C[b,c]·L_bᵀL_c as ONE (qn,n)·(n,qn) matmul:
    # Ltall[m, (c,l)] = L_G[c,m,l] ⇒ (LtallᵀLtall)[(b,k),(c,l)] = (L_bᵀL_c)[k,l],
    # then the block scaling by C is a broadcast multiply XLA fuses into the
    # matmul epilogue. (A q² unrolled dynamic-update loop scales HLO size
    # quadratically in q and chokes the compiler at the synthetic default q=25.)
    Ltall = jnp.transpose(L_G, (1, 0, 2)).reshape(n, q * r)
    P = _mm(Ltall.T, Ltall).reshape(q, r, q, r)
    cap = (C[:, None, :, None] * P).reshape(q * r, q * r) \
        + jnp.eye(q * r, dtype=roots.dtype)
    L_cap = safe_cholesky(cap)
    return dict(L_G=L_G, Rt=Rt, C=C, SinvH=SinvH, L_cap=L_cap, H=H, q=q, n=n,
                r=r)


def _u_from_y(Ydelta, fac):
    """u = Aᵀ D⁻¹ vec(Y) reshaped to (q, n): u[b] = (Σt⁻¹H)ᵀ Yᵀ row b."""
    W = cho_solve(fac["Rt"], Ydelta.T).T           # Y Σt^{-1}  (n, t)
    u = _mm(W, fac["H"]).T                          # (q, n)
    return W, u


def lmc_log_prob(Ks, H, Sigma_t, Ydelta, jitter: float = 1e-6, fac=None):
    """log N(vec(Y); 0, Σ_b K_b ⊗ h_b h_bᵀ + I ⊗ Σt) — exact, dense."""
    n, t = Ydelta.shape
    if fac is None:
        fac = lmc_factors(Ks, H, Sigma_t, jitter)
    W, u = _u_from_y(Ydelta, fac)
    s = jnp.einsum("bnk,bn->bk", fac["L_G"], u, precision=_HIGHEST)  # L_Gᵀ u
    v = solve_triangular(fac["L_cap"], s.reshape(-1), lower=True)
    quad = jnp.sum(Ydelta * W) - jnp.sum(v * v)
    logdet = n * logdet_from_chol(fac["Rt"]) + logdet_from_chol(fac["L_cap"])
    return -0.5 * (quad + logdet + n * t * math.log(2 * math.pi))


def lmc_solve(Ydelta, fac):
    """α (n, t) with vec(α) = Cov⁻¹ vec(Y)."""
    W, u = _u_from_y(Ydelta, fac)
    s = jnp.einsum("bnk,bn->bk", fac["L_G"], u, precision=_HIGHEST)  # L_Gᵀ u
    z = cho_solve(fac["L_cap"], s.reshape(-1)).reshape(fac["q"], fac["r"])
    t2 = jnp.einsum("bnk,bk->bn", fac["L_G"], z, precision=_HIGHEST)  # L_G z (q,n)
    # D^{-1} A t2: (i, t) = Σ_b (Σt^{-1}h_b)[t] t2[b, i]
    corr = _mm(t2.T, fac["SinvH"].T)                # (n, t)
    return W - corr


def lmc_sgpr_posterior(roots_star, fac, alpha, mean_star, noise: bool = True,
                       chunk: int = 512, kss_star=None):
    """Posterior (mean, var-diag) for the low-rank (Nyström) LMC/ICM model.

    With Σ_train = U Uᵀ + D (U = [R_b ⊗ h_b], D = I⊗Σt) and the same factors
    at test points U* = [R*_b ⊗ h_b], the posterior covariance collapses to

        Cov* = U* U*ᵀ − U* Uᵀ Σ⁻¹ U U*ᵀ = U* Cap⁻¹ U*ᵀ

    (Woodbury algebra: Uᵀ Σ⁻¹ U = I − Cap⁻¹, so the bracket is Cap⁻¹) — one
    triangular solve against the (qm)×(qm) capacitance factor per test chunk,
    no n×n* cross-covariance ever materialized. Mean = U*(Uᵀ α).

    roots_star: (q, n*, m); alpha: (n, t) = Σ⁻¹ vec(Y) in matrix form.

    kss_star (q, n*), if given, adds the low-rank diag gap
    Σ_b clip(kss_b − diag(R*_b R*_bᵀ), 0)·H[t,b]² so the variance reverts to
    the TRUE prior away from the inducing points instead of the degenerate
    subset-of-regressors 0 (parity with the reference's InducingPointKernel
    diag correction; see models/exact.py posterior for the single-task
    analog — found via diag_sarcos experiment 1, round 5).
    """
    H, L_G, L_cap = fac["H"], fac["L_G"], fac["L_cap"]
    q, n_star, r = roots_star.shape
    t = H.shape[0]
    Ah = _mm(alpha, H)                                  # (n, q)
    u = jnp.einsum("bnk,nb->bk", L_G, Ah, precision=_HIGHEST)   # R_bᵀ(αh_b)
    proj = jnp.einsum("bik,bk->ib", roots_star, u, precision=_HIGHEST)
    mean = _mm(proj, H.T) + mean_star

    Rt = fac["Rt"]
    noise_diag = jnp.diagonal(_mm(Rt, Rt.T))

    def chunk_var(Rc):                                  # (q, c, m)
        c = Rc.shape[1]
        Wmat = jnp.einsum("bik,tb->bkit", Rc, H,
                          precision=_HIGHEST).reshape(q * r, c * t)
        V = solve_triangular(L_cap, Wmat, lower=True)
        return jnp.sum(V * V, axis=0).reshape(c, t)

    if n_star <= chunk:
        var = chunk_var(roots_star)
    else:
        pad = (-n_star) % chunk
        Rp = jnp.pad(roots_star, ((0, 0), (0, pad), (0, 0)))
        blocks = jnp.moveaxis(Rp.reshape(q, -1, chunk, r), 1, 0)
        var = jax.lax.map(chunk_var, blocks).reshape(-1, t)[:n_star]
    if kss_star is not None:
        gap = jnp.clip(kss_star - jnp.sum(roots_star * roots_star, axis=-1),
                       min=0.0)                         # (q, n*)
        var = var + _mm(gap.T, (H * H).T)               # (n*, t)
    if noise:
        var = var + noise_diag[None, :]
    return mean, jnp.clip(var, min=1e-12)


def lmc_posterior_mean(Kstars, H, alpha, mean_star):
    """mean (n*, t) = Σ_b (K_*b (α h_b)) h_bᵀ + m(x*). Kstars: (q, n*, n)."""
    ah = _mm(alpha, H)                              # (n, q)
    proj = jnp.einsum("bmi,ib->mb", Kstars, ah, precision=_HIGHEST)  # (n*, q)
    return _mm(proj, H.T) + mean_star


def lmc_posterior_variance(Kstars, Kstar_diag, H, Sigma_t, fac,
                           noise: bool = True, chunk: int = 256):
    """Posterior variance diag (n*, t) of the LMC model (+ observation noise).

    prior:      Σ_b diag(K**_b)[i] H[t,b]²  (+ Σt[t,t])
    correction: diag(Cross Cov⁻¹ Crossᵀ) via the same Woodbury split, chunked
                over test points with a static chunk size.
    """
    q, n_star, n = Kstars.shape
    t = H.shape[0]
    H2 = H * H
    prior = _mm(Kstar_diag.T, H2.T)                 # (n*, t)
    if noise:
        prior = prior + jnp.diagonal(Sigma_t)[None, :]

    C, SinvH, L_G, L_cap = fac["C"], fac["SinvH"], fac["L_G"], fac["L_cap"]

    def chunk_corr(Kc):                             # Kc: (q, c, n)
        c = Kc.shape[1]
        # term1[(i,t)] = Σ_{b,d} C[b,d] H[t,b] H[t,d] Σ_j Kc_b[i,j] Kc_d[i,j]
        rowdot = jnp.einsum("bij,dij->bdi", Kc, Kc, precision=_HIGHEST)  # (q,q,c)
        term1 = jnp.einsum("bd,tb,td,bdi->it", C, H, H, rowdot, precision=_HIGHEST)
        # N = L_Gᵀ Aᵀ D⁻¹ Crossᵀ : block b, test-col (i,t):
        #   (Aᵀ D⁻¹ Crossᵀ)[(b,j),(i,t)] = Σ_d (Σt⁻¹H)ᵀ... = Σ_d C[b,d]? no —
        #   Aᵀ D⁻¹ has rows (b, j): h_bᵀ Σt⁻¹ applied per point j; Crossᵀ[(j,s),(i,t)] =
        #   Σ_d K_d[i,j] H[t,d] H[s,d]  =>  E[(b,j),(i,t)] = Σ_d (hᵀΣt⁻¹h)_{bd} K_d[i,j] H[t,d]
        E = jnp.einsum("bd,dij,td->bjit", C, Kc, H, precision=_HIGHEST)  # (q,n,c,t)
        Nmat = jnp.einsum("bnk,bnit->bkit", L_G, E, precision=_HIGHEST)  # L_Gᵀ E
        Nflat = Nmat.reshape(q * L_G.shape[-1], c * t)
        Vsol = solve_triangular(L_cap, Nflat, lower=True)
        term2 = jnp.sum(Vsol * Vsol, axis=0).reshape(c, t)
        return term1 - term2

    if n_star <= chunk:
        corr = chunk_corr(Kstars)
    else:
        pad = (-n_star) % chunk
        Kp = jnp.pad(Kstars, ((0, 0), (0, pad), (0, 0)))
        blocks = jnp.moveaxis(Kp.reshape(q, -1, chunk, n), 1, 0)  # (nb, q, chunk, n)
        corr = jax.lax.map(chunk_corr, blocks).reshape(-1, t)[:n_star]

    return jnp.clip(prior - corr, min=1e-6)
