"""Host-side initialization factorizations: SVD / QR of the training labels.

Mirrors ``init_lmc_coefficients`` (projected_lmc.py:183-201): the reference uses
sklearn's ``randomized_svd(..., random_state=0)`` when n_data >= n_latents and a
complete numpy QR otherwise, with a 1e-3 floor on missing singular values. These
run once at model construction on the host (numpy), so bit-parity with the
reference initialization is preserved; nothing here is traced by XLA.
"""

from __future__ import annotations

import numpy as np


def randomized_svd(M, n_components: int, random_state: int = 0):
    """Randomized truncated SVD with sklearn semantics (fallback: exact SVD)."""
    try:
        from sklearn.utils.extmath import randomized_svd as _rsvd
        return _rsvd(np.asarray(M), n_components=n_components, random_state=random_state)
    except Exception:
        U, S, Vt = np.linalg.svd(np.asarray(M), full_matrices=False)
        return U[:, :n_components], S[:n_components], Vt[:n_components]


def init_lmc_coefficients(train_y, n_latents: int, QR_form: bool = False):
    """SVD-based init of the LMC mixing matrix from labels (projected_lmc.py:183-201).

    Args:
        train_y: (n_data, n_tasks) numpy-convertible labels.
        n_latents: number of latent processes q.
        QR_form: if True return (U, S) with U (n_tasks, q) orthonormal columns and
            S the leading singular values; else return coefficients (q, n_tasks)
            = (U * S / sqrt(n-1)).T

    Returns:
        numpy arrays (callers convert to jnp with the model dtype).
    """
    Y = np.asarray(train_y)
    n_data, n_tasks = Y.shape
    if n_data >= n_latents:
        U, S, _ = randomized_svd(Y.T, n_components=n_latents, random_state=0)
    else:
        Q, R = np.linalg.qr(Y.T, mode="complete")
        S = 1e-3 * np.ones(n_latents, dtype=Y.dtype)
        S[:n_data] = np.diag(R).copy()
        U = Q[:, :n_latents]
    if QR_form:
        return U, S
    y_transformed = U * S / np.sqrt(n_data - 1)
    return y_transformed.T


def latin_hypercube(n: int, dim: int, seed: int = 0):
    """Scrambled LHC sample in [0,1)^dim (scipy.stats.qmc.LatinHypercube parity).

    The reference initializes shared inducing points with
    ``qmc.LatinHypercube(d=dim, seed=seed)`` mapped to [-1, 1]
    (projected_lmc.py:732-734). Falls back to a numpy implementation when scipy
    is unavailable.
    """
    try:
        from scipy.stats import qmc
        sampler = qmc.LatinHypercube(d=dim, seed=seed)
        return sampler.random(n=n)
    except Exception:
        rng = np.random.default_rng(seed)
        samples = (rng.permuted(np.tile(np.arange(n), (dim, 1)), axis=1).T
                   + rng.random((n, dim))) / n
        return samples


def sobol(n: int, dim: int, seed: int = 0):
    """Sobol' sample in [0,1)^dim (the README-documented alternative to LHC)."""
    try:
        from scipy.stats import qmc
        sampler = qmc.Sobol(d=dim, seed=seed, scramble=True)
        return sampler.random(n=n)
    except Exception:
        rng = np.random.default_rng(seed)
        return rng.random((n, dim))
