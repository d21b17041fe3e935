"""Stationary kernels, composition, and the kernel factory.

TPU-native rewrite of the kernel layer the reference delegates to gpytorch
(projected_lmc.py:26-35 SplineKernel, :107-181 handle_covar_). All kernels are
batched over a leading ``n_funcs`` dimension (tasks or latents) and evaluate as
dense tiles through MXU-friendly matmul expansions of the pairwise distance:
``|x-y|² = |x|² + |y|² - 2<x,y>`` with HIGHEST-precision matmuls, which XLA maps
onto the systolic array. Every kernel returns shape ``(n_funcs, n, m)``
(or ``(n_funcs, n)`` with ``diag=True``).
"""

from __future__ import annotations

import math
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from .module import Module
from . import constraints

_HIGHEST = jax.lax.Precision.HIGHEST


def _sqdist(x1, x2):
    """Batched pairwise squared distances (..., n, d), (..., m, d) -> (..., n, m)."""
    n1 = jnp.sum(x1 * x1, axis=-1)
    n2 = jnp.sum(x2 * x2, axis=-1)
    cross = jnp.matmul(x1, jnp.swapaxes(x2, -1, -2), precision=_HIGHEST)
    d2 = n1[..., :, None] + n2[..., None, :] - 2.0 * cross
    return jnp.maximum(d2, 0.0)


def _profile(d2, kind):
    """Stationary profile k(d2) for the custom-VJP kernel-matrix op."""
    if kind == "rbf":
        return jnp.exp(-0.5 * d2)
    eps = jnp.asarray(1e-30, d2.dtype)
    r = jnp.sqrt(jnp.maximum(d2, eps))
    if kind == "matern05":
        return jnp.exp(-r)
    if kind == "matern15":
        c = math.sqrt(3.0) * r
        return (1.0 + c) * jnp.exp(-c)
    c = math.sqrt(5.0) * r
    return (1.0 + c + (5.0 / 3.0) * d2) * jnp.exp(-c)


def _dprofile(d2, kind):
    """dk/d(d2). Closed forms so the backward pass is ONE fused elementwise
    read of the cotangent instead of XLA's saved-residual chain."""
    if kind == "rbf":
        return -0.5 * jnp.exp(-0.5 * d2)
    eps = jnp.asarray(1e-30, d2.dtype)
    r = jnp.sqrt(jnp.maximum(d2, eps))
    if kind == "matern05":
        # non-differentiable at r=0: the symmetric subgradient is 0 there
        # (matches the (Δx)²·(1/r) → 0 limit of the lengthscale gradient)
        return jnp.where(d2 <= 1e-12, jnp.zeros_like(d2),
                         -jnp.exp(-r) / (2.0 * r))
    if kind == "matern15":
        return -1.5 * jnp.exp(-math.sqrt(3.0) * r)
    return (-5.0 / 6.0) * (1.0 + math.sqrt(5.0) * r) * jnp.exp(-math.sqrt(5.0) * r)


@partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5))
def stationary_kernel_matrix(x1, x2, ls, kind, use_pallas=False,
                             out_dtype=None):
    """Batched stationary kernel matrix K_b = k(|x1/ls_b − x2/ls_b|²), (B,n,m).

    x1 (n,d) and x2 (m,d) are SHARED across the lengthscale batch (B,1,d) —
    the layout of every multi-latent GP here. Custom VJP: XLA's autodiff of
    the distance→profile chain materializes several (B,n,m) elementwise
    intermediates (measured ~50 ms of a 64 ms exact-LMC training step at
    n=10⁴, q=4 on one TPU chip); the hand-written backward reduces to one
    fused elementwise pass over the cotangent plus matvec-sized contractions
    via (x_i−x_j)² = x_i² + x_j² − 2x_i x_j, and serves double duty as the
    gradient rule for the Pallas fused-tile forward (``use_pallas=True``),
    which has no autodiff rule of its own.

    ``out_dtype`` (e.g. bfloat16 for the matrix-free LMC stack) downcasts the
    result at the producer: the Pallas path writes downcast tiles straight
    from VMEM; the XLA path lets the compiler fuse the cast into the
    construction epilogue. Either way no full-precision (B, n, m) object
    reaches HBM.

    Inputs are centered (translation invariance, exact) so the expansion is
    numerically safe for large-offset features (e.g. datetime axes).
    """
    K, _ = _skm_fwd(x1, x2, ls, kind, use_pallas, out_dtype)
    return K


def _skm_fwd(x1, x2, ls, kind, use_pallas, out_dtype=None):
    mu = jax.lax.stop_gradient(jnp.mean(x1, axis=0))
    x1c, x2c = x1 - mu, x2 - mu
    # multi-TPU routes through the XLA build: pallas_call is not
    # automatically partitionable under pjit, the einsum build is.
    # bf16-out non-symmetric builds also route to XLA: measured SLOWER in
    # Pallas (bench_pallas_delta bf16 0.94x vs XLA build+fused cast, r3 —
    # the downcast epilogue stalls the tile pipeline; the symmetric
    # training-stack builder, 1.23x, is unaffected — it lives in
    # fused_mll._scaled_stack).
    if use_pallas and jax.default_backend() == "tpu" \
            and jax.device_count() == 1 \
            and x1.dtype == jnp.float32 \
            and not (out_dtype is not None
                     and jnp.dtype(out_dtype) == jnp.bfloat16):
        from .ops.pallas_kernels import fused_kernel_matrix
        K = fused_kernel_matrix(x1c, x2c, ls, kind, False, out_dtype)
    else:
        K = _profile(_sqdist(x1c[None] / ls, x2c[None] / ls), kind)
        if out_dtype is not None:
            K = K.astype(out_dtype)
    return K, (x1c, x2c, ls)


_BWD_SLAB = 2048


def _skm_bwd_slabbed(kind, x1c, x2c, ls, g):
    """Row-slab scan of the backward reductions: peak extra memory is one
    (B, slab, m) block instead of the full (B, n, m) W — at n=m=20k the
    difference between ~0.7 GB and ~6.4 GB of HBM. The scan operand stays in
    the cotangent's own dtype (bf16 when the model runs a bf16 stack)."""
    B = ls.shape[0]
    n, d = x1c.shape
    # a slab that divides n makes the reshape a free bitcast (no pad copy of
    # the (B, n, m) cotangent)
    slab = next((s for s in range(min(_BWD_SLAB, n), 0, -1) if n % s == 0
                 and s >= 512), None) or _BWD_SLAB
    pad = (-n) % slab
    x1p = jnp.pad(x1c, ((0, pad), (0, 0)))
    gp = jnp.pad(g, ((0, 0), (0, pad), (0, 0)))
    nb = (n + pad) // slab
    x1b = x1p.reshape(nb, slab, d)
    gb = jnp.moveaxis(gp.reshape(B, nb, slab, -1), 1, 0)
    a2 = x2c[None] / ls
    m = x2c.shape[0]
    acc0 = (jnp.zeros((B, m), jnp.float32), jnp.zeros((B, m, d), jnp.float32))

    def body(carry, inp):
        cols, Wtx1 = carry
        xb, gblk = inp
        d2 = _sqdist(xb[None] / ls, a2)                   # (B, S, m)
        W = gblk.astype(jnp.float32) * _dprofile(d2, kind)
        rows_i = jnp.sum(W, axis=-1)
        cols = cols + jnp.sum(W, axis=-2)
        Wx2_i = jnp.einsum("bij,jd->bid", W, x2c, precision=_HIGHEST)
        Wtx1 = Wtx1 + jnp.einsum("bij,id->bjd", W, xb, precision=_HIGHEST)
        return (cols, Wtx1), (rows_i, Wx2_i)

    (cols, Wtx1), (rows_s, Wx2_s) = jax.lax.scan(body, acc0, (x1b, gb))
    rows = jnp.moveaxis(rows_s, 0, 1).reshape(B, -1)[:, :n]
    Wx2 = jnp.moveaxis(Wx2_s, 0, 1).reshape(B, -1, d)[:, :n]
    return rows, cols, Wx2, Wtx1


def _skm_bwd(kind, use_pallas, out_dtype, res, g):
    x1c, x2c, ls = res
    n, m = x1c.shape[0], x2c.shape[0]
    # slab only under real memory pressure (the monolithic path is ~20%
    # faster when W fits): fp32 W above ~2 GB
    if (g.dtype in (jnp.float32, jnp.bfloat16)
            and ls.shape[0] * n * m > 500_000_000):
        rows, cols, Wx2, Wtx1 = _skm_bwd_slabbed(kind, x1c, x2c, ls, g)
    else:
        d2 = _sqdist(x1c[None] / ls, x2c[None] / ls)
        W = g * _dprofile(d2, kind)                           # (B,n,m)
        rows = jnp.sum(W, axis=-1)                            # (B,n)
        cols = jnp.sum(W, axis=-2)                            # (B,m)
        Wx2 = jnp.einsum("bij,jd->bid", W, x2c, precision=_HIGHEST)
        Wtx1 = jnp.einsum("bij,id->bjd", W, x1c, precision=_HIGHEST)
    lsq = ls[:, 0, :]                                         # (B,d)
    ls2 = lsq * lsq
    sq1 = jnp.einsum("bi,id->bd", rows, x1c * x1c, precision=_HIGHEST)
    sq2 = jnp.einsum("bj,jd->bd", cols, x2c * x2c, precision=_HIGHEST)
    crossd = jnp.einsum("bid,id->bd", Wx2, x1c, precision=_HIGHEST)
    # dd2/dls_bd = −2 (x1_id − x2_jd)² / ls_bd³
    dls = (sq1 + sq2 - 2.0 * crossd) * (-2.0)
    if lsq.shape[-1] == 1 and dls.shape[-1] != 1:
        # scalar (non-ARD) lengthscale shared over d>1 features: the cotangent
        # is the sum of the per-dimension contributions
        dls = jnp.sum(dls, axis=-1, keepdims=True)
    dls = dls / (lsq * ls2)
    dx1 = 2.0 * jnp.sum((rows[..., None] * x1c[None] - Wx2) / ls2[:, None, :],
                        axis=0)
    dx2 = 2.0 * jnp.sum((cols[..., None] * x2c[None] - Wtx1) / ls2[:, None, :],
                        axis=0)
    # cotangent dtypes must match the primals (mixed fp64 data / fp32 params)
    return (dx1.astype(x1c.dtype), dx2.astype(x2c.dtype),
            dls[:, None, :].astype(ls.dtype))


stationary_kernel_matrix.defvjp(_skm_fwd, _skm_bwd)


class Prior:
    """Lengthscale priors (handle_covar_ registers Normal/MVN priors,
    projected_lmc.py:143-149). Adds log_prob terms to the MLL.

    Priors live in kernel pytrees' STATIC aux data; value-based
    equality/hash (array-aware) keeps two models built with equal priors
    treedef-equal — no spurious jit retraces, and same-config batching
    (training.fit_ensemble) works."""

    def log_prob(self, value):
        raise NotImplementedError

    def __eq__(self, other):
        return type(self) is type(other) and \
            self.__dict__.keys() == other.__dict__.keys() and \
            all(np.array_equal(v, other.__dict__[k])
                for k, v in self.__dict__.items())

    def __hash__(self):
        return hash((type(self).__name__,
                     tuple((k, np.asarray(v).tobytes())
                           for k, v in sorted(self.__dict__.items()))))


class NormalPrior(Prior):
    def __init__(self, loc, scale):
        self.loc = np.asarray(loc, dtype=np.float64)
        self.scale = np.asarray(scale, dtype=np.float64)

    def log_prob(self, value):
        loc = jnp.asarray(self.loc, value.dtype)
        scale = jnp.asarray(self.scale, value.dtype)
        z = (value - loc) / scale
        return jnp.sum(-0.5 * z**2 - jnp.log(scale) - 0.5 * math.log(2 * math.pi))


class MultivariateNormalPrior(Prior):
    """Diagonal-covariance MVN prior (reference uses diag_embed covariances)."""

    def __init__(self, loc, variance_diag):
        self.loc = np.asarray(loc, dtype=np.float64)
        self.var = np.asarray(variance_diag, dtype=np.float64)

    def log_prob(self, value):
        loc = jnp.asarray(self.loc, value.dtype)
        var = jnp.asarray(self.var, value.dtype)
        z2 = (value - loc) ** 2 / var
        return jnp.sum(-0.5 * z2 - 0.5 * jnp.log(var) - 0.5 * math.log(2 * math.pi))


class Kernel(Module):
    """Base kernel. Subclasses implement ``forward(x1, x2, diag)`` on
    pre-sliced, pre-scaled inputs of shape (n_funcs, n, d)."""

    has_lengthscale = False
    is_stationary = True
    _buffers_ = ()

    def _setup(self, batch_shape=1, active_dims=None):
        self.batch = int(batch_shape)
        self.active_dims = tuple(active_dims) if active_dims is not None else None
        self.lengthscale_prior = None  # Prior | None (static)

    # -- public API ---------------------------------------------------------
    def __call__(self, x1, x2=None, diag=False):
        if x2 is None:
            x2 = x1
        x1 = jnp.asarray(x1)
        x2 = jnp.asarray(x2)
        if x1.ndim == 1:
            x1 = x1[:, None]
        if x2.ndim == 1:
            x2 = x2[:, None]
        if self.active_dims is not None:
            idx = list(self.active_dims)
            x1 = x1[..., idx]
            x2 = x2[..., idx]
        if x1.ndim == 2:
            x1 = jnp.broadcast_to(x1[None], (self.batch,) + x1.shape)
            x2 = jnp.broadcast_to(x2[None], (self.batch,) + x2.shape)
        return self.forward(x1, x2, diag=diag)

    @property
    def lengthscale(self):
        if not self.has_lengthscale:
            raise AttributeError(f"{type(self).__name__} has no lengthscale")
        return constraints.softplus(self.raw_lengthscale)

    def set_lengthscale(self, value):
        value = jnp.broadcast_to(jnp.asarray(value, self.raw_lengthscale.dtype),
                                 self.raw_lengthscale.shape)
        return self.replace(raw_lengthscale=constraints.inv_softplus(value))

    def prior_log_prob(self):
        """Sum of hyperparameter-prior log-probs (added to MLLs)."""
        if self.has_lengthscale and self.lengthscale_prior is not None:
            return self.lengthscale_prior.log_prob(self.lengthscale[..., 0, :])
        return jnp.zeros(())

    def sub_kernels(self):
        return []


class _StationaryKernel(Kernel):
    has_lengthscale = True
    _pallas_kind = None  # set by subclasses that have a fused Pallas tile op

    def __init__(self, ard_num_dims=1, batch_shape=1, active_dims=None,
                 lengthscale_prior=None, use_pallas=True, dtype=jnp.float32):
        self._setup(batch_shape, active_dims)
        d = int(ard_num_dims) if ard_num_dims else 1
        init = constraints.inv_softplus(jnp.asarray(1.0, dtype))
        # gpytorch shape convention: (batch, 1, d)
        self.raw_lengthscale = jnp.full((self.batch, 1, d), init, dtype=dtype)
        self.lengthscale_prior = lengthscale_prior
        # default ON: the fused Pallas tile builder serves every fp32 dense
        # evaluation on TPU (the _skm_fwd guard falls back to the XLA path on
        # CPU, in x64, and for shapes the tile op does not cover)
        self.use_pallas = bool(use_pallas)

    def _scaled(self, x1, x2):
        ls = self.lengthscale  # (B, 1, d)
        return x1 / ls, x2 / ls

    def __call__(self, x1, x2=None, diag=False, out_dtype=None):
        """Dense evaluations on shared (2-D) inputs route through the
        custom-VJP :func:`stationary_kernel_matrix` (memory-optimal backward;
        Pallas forward tiles when ``use_pallas``). Batched 3-D inputs and
        diagonals fall back to the generic path. ``out_dtype`` requests a
        downcast result materialized directly at the producer (bf16
        kernel stacks)."""
        a1 = jnp.asarray(x1)
        a2 = a1 if x2 is None else jnp.asarray(x2)
        if not diag and self._pallas_kind and a1.ndim <= 2 and a2.ndim <= 2:
            if a1.ndim == 1:
                a1 = a1[:, None]
            if a2.ndim == 1:
                a2 = a2[:, None]
            if self.active_dims is not None:
                idx = list(self.active_dims)
                a1 = a1[:, idx]
                a2 = a2[:, idx]
            return stationary_kernel_matrix(a1, a2, self.lengthscale,
                                            self._pallas_kind, self.use_pallas,
                                            out_dtype)
        K = super().__call__(x1, x2, diag=diag)
        return K if out_dtype is None else K.astype(out_dtype)

    def _maybe_pallas(self, x1, x2):
        """Fused Pallas tile path (ops/pallas_kernels.py): inputs are shared
        across the batch, so the (B, n, d) broadcast collapses to row 0."""
        if not (self.use_pallas and self._pallas_kind):
            return None
        if jax.default_backend() != "tpu" or jax.device_count() != 1:
            return None   # pallas_call is not partitionable under pjit
        from .ops.pallas_kernels import fused_kernel_matrix
        return fused_kernel_matrix(x1[0], x2[0], self.lengthscale,
                                   self._pallas_kind, False)


class RBFKernel(_StationaryKernel):
    """k(x,y) = exp(-0.5 |x-y|²/l²), ARD. (gpytorch RBFKernel equivalent)"""

    _pallas_kind = "rbf"

    def forward(self, x1, x2, diag=False):
        if diag:
            n = min(x1.shape[-2], x2.shape[-2])
            d2 = jnp.sum(((x1[..., :n, :] - x2[..., :n, :]) / self.lengthscale) ** 2, axis=-1)
            return jnp.exp(-0.5 * d2)
        fused = self._maybe_pallas(x1, x2)
        if fused is not None:
            return fused
        a, b = self._scaled(x1, x2)
        return jnp.exp(-0.5 * _sqdist(a, b))


class MaternKernel(_StationaryKernel):
    """Matern kernel, nu in {0.5, 1.5, 2.5} (gpytorch default nu=2.5).

    The reference's synthetic generator and all real-data experiments use
    ``gp.kernels.MaternKernel()`` (experiments.py:139,174)."""

    def __init__(self, nu: float = 2.5, **kwargs):
        assert nu in (0.5, 1.5, 2.5), "nu must be 0.5, 1.5 or 2.5"
        super().__init__(**kwargs)
        self.nu = float(nu)
        self._pallas_kind = {0.5: "matern05", 1.5: "matern15", 2.5: "matern25"}[self.nu]

    def forward(self, x1, x2, diag=False):
        if diag:
            n = min(x1.shape[-2], x2.shape[-2])
            d2 = jnp.sum(((x1[..., :n, :] - x2[..., :n, :]) / self.lengthscale) ** 2, axis=-1)
        else:
            fused = self._maybe_pallas(x1, x2)
            if fused is not None:
                return fused
            a, b = self._scaled(x1, x2)
            d2 = _sqdist(a, b)
        # sqrt with a zero-safe gradient (distance of identical points)
        eps = jnp.asarray(1e-30, d2.dtype)
        r = jnp.sqrt(jnp.maximum(d2, eps))
        if self.nu == 0.5:
            return jnp.exp(-r)
        if self.nu == 1.5:
            c = math.sqrt(3.0) * r
            return (1.0 + c) * jnp.exp(-c)
        c = math.sqrt(5.0) * r
        return (1.0 + c + (5.0 / 3.0) * d2) * jnp.exp(-c)


class SplineKernel(Kernel):
    """Cubic-spline kernel (projected_lmc.py:26-35): per-dim
    1 + min·max + ½ min² (max − min/3), product over dims; the diag fast path is
    (1 + x² + x³/3).prod, as in the reference."""

    has_lengthscale = False

    def __init__(self, batch_shape=1, active_dims=None, **_):
        self._setup(batch_shape, active_dims)
        self._dummy = jnp.zeros((0,))  # keeps the pytree non-empty

    def forward(self, x1, x2, diag=False):
        if diag:
            n = min(x1.shape[-2], x2.shape[-2])
            x = x1[..., :n, :]
            return jnp.prod(1 + x**2 + x**3 / 3.0, axis=-1)
        mins = jnp.minimum(x1[..., :, None, :], x2[..., None, :, :])
        maxs = jnp.maximum(x1[..., :, None, :], x2[..., None, :, :])
        oned = 1 + mins * maxs + 0.5 * mins**2 * (maxs - mins / 3.0)
        return jnp.prod(oned, axis=-1)


class SpectralMixtureKernel(Kernel):
    """Spectral mixture kernel (Wilson & Adams 2013), used by the reference for
    the bramblemet tidal experiment (realdata_experiments.py:130-140):

        k(τ) = Σ_q w_q Π_d exp(-2π² τ_d² σ_qd²) cos(2π τ_d μ_qd)
    """

    has_lengthscale = False
    is_stationary = True

    def __init__(self, num_mixtures: int = 4, ard_num_dims: int = 1, batch_shape=1,
                 active_dims=None, seed: int = 0, dtype=jnp.float32, **_):
        self._setup(batch_shape, active_dims)
        self.num_mixtures = int(num_mixtures)
        d = int(ard_num_dims)
        rng = np.random.default_rng(seed)
        init = constraints.inv_softplus(jnp.asarray(1.0, dtype))
        self.raw_mixture_weights = jnp.full((self.batch, self.num_mixtures), init, dtype)
        self.raw_mixture_means = jnp.asarray(
            constraints.inv_softplus(jnp.asarray(rng.random((self.batch, self.num_mixtures, 1, d)) + 0.1)), dtype)
        self.raw_mixture_scales = jnp.full((self.batch, self.num_mixtures, 1, d), init, dtype)

    @property
    def mixture_weights(self):
        return constraints.softplus(self.raw_mixture_weights)

    @property
    def mixture_means(self):
        return constraints.softplus(self.raw_mixture_means)

    @property
    def mixture_scales(self):
        return constraints.softplus(self.raw_mixture_scales)

    def initialize_from_data(self, train_x, train_y, seed: int = 0):
        """gpytorch 1.11 SpectralMixtureKernel.initialize_from_data heuristic:
        means ~ Unif(0, 0.5/min_spacing) (below Nyquist), scales =
        1/(|N(0,1)|·data_range) (reciprocal of a |Gaussian| lengthscale of the
        data range — heavy-tailed in frequency space), weights = std(y)/Q.
        Required before training the tidal experiment's kernel
        (realdata_experiments.py:130-140)."""
        x = np.atleast_2d(np.asarray(train_x))
        if x.shape[0] == 1:
            x = x.T
        y = np.asarray(train_y)
        d = x.shape[-1] if self.active_dims is None else len(self.active_dims)
        if self.active_dims is not None:
            x = x[:, list(self.active_dims)]
        xs = np.sort(x, axis=0)
        diffs = np.diff(xs, axis=0)
        min_dist = np.where(diffs > 0, diffs, np.inf).min(axis=0)
        min_dist = np.where(np.isfinite(min_dist), min_dist, 1.0)
        max_dist = np.maximum(xs[-1] - xs[0], 1e-6)
        rng = np.random.default_rng(seed)
        Q, B = self.num_mixtures, self.batch
        means = rng.random((B, Q, 1, d)) * (0.5 / min_dist)
        scales = 1.0 / np.maximum(
            np.abs(rng.standard_normal((B, Q, 1, d))) * max_dist, 1e-8)
        weights = np.full((B, Q), y.std() / Q)
        dt = self.raw_mixture_means.dtype
        return self.replace(
            raw_mixture_means=constraints.inv_softplus(jnp.asarray(np.maximum(means, 1e-6), dt)),
            raw_mixture_scales=constraints.inv_softplus(jnp.asarray(scales, dt)),
            raw_mixture_weights=constraints.inv_softplus(jnp.asarray(np.maximum(weights, 1e-6), dt)),
        )

    def initialize_from_data_empspect(self, train_x, train_y, seed: int = 0):
        """Empirical-spectrum init (gpytorch initialize_from_data_empspect):
        mixture means at the top-Q periodogram peaks, bandwidths at the
        frequency resolution, weights at the peaks' power share of var(y).

        Frequency fitting is multimodal — the Unif-below-Nyquist draw of
        :meth:`initialize_from_data` rarely lands in the attraction basin of
        a sharp spectral line (e.g. the M2 tide in the bramblemet series);
        reading the FFT does. Requires near-regular 1-D sampling; falls back
        to the standard heuristic otherwise."""
        x = np.atleast_2d(np.asarray(train_x, np.float64))
        if x.shape[0] == 1:
            x = x.T
        y = np.asarray(train_y, np.float64)
        if y.ndim == 1:
            y = y[:, None]
        d = x.shape[-1] if self.active_dims is None else len(self.active_dims)
        if d != 1:
            return self.initialize_from_data(train_x, train_y, seed=seed)
        xs = x[:, 0] if self.active_dims is None else x[:, self.active_dims[0]]
        order = np.argsort(xs)
        xs, y = xs[order], y[order]
        dt = float(np.median(np.diff(xs)))
        if dt <= 0:
            return self.initialize_from_data(train_x, train_y, seed=seed)
        # resample onto a regular grid (linear interp bridges held-out
        # windows/jitter) so the FFT sees true frequencies
        grid = np.arange(xs[0], xs[-1] + 0.5 * dt, dt)
        yg = np.stack([np.interp(grid, xs, y[:, t]) for t in range(y.shape[1])],
                      axis=1)
        n = len(grid)
        yc = yg - yg.mean(axis=0)
        power = (np.abs(np.fft.rfft(yc, axis=0)) ** 2).sum(axis=1)
        freqs = np.fft.rfftfreq(n, dt)
        Q, B = self.num_mixtures, self.batch
        top = np.argsort(power[1:])[::-1][:Q] + 1  # skip DC
        if len(top) < Q:                           # degenerate tiny series
            return self.initialize_from_data(train_x, train_y, seed=seed)
        means = np.tile(freqs[top][None, :, None, None], (B, 1, 1, 1))
        df = freqs[1] - freqs[0]                   # frequency resolution
        scales = np.full((B, Q, 1, 1), df)
        w = power[top] / power[top].sum() * y.var(axis=0).mean()
        weights = np.tile(w[None, :], (B, 1))
        dtp = self.raw_mixture_means.dtype
        return self.replace(
            raw_mixture_means=constraints.inv_softplus(
                jnp.asarray(np.maximum(means, 1e-12), dtp)),
            raw_mixture_scales=constraints.inv_softplus(
                jnp.asarray(np.maximum(scales, 1e-12), dtp)),
            raw_mixture_weights=constraints.inv_softplus(
                jnp.asarray(np.maximum(weights, 1e-12), dtp)),
        )

    def forward(self, x1, x2, diag=False):
        if diag:
            n = min(x1.shape[-2], x2.shape[-2])
            tau = (x1[..., :n, :] - x2[..., :n, :])[..., None, :, :]   # (B,1,n,d)
            exp_term = jnp.exp(-2 * math.pi**2 * tau**2 * self.mixture_scales**2)
            cos_term = jnp.cos(2 * math.pi * tau * self.mixture_means)
            comp = jnp.prod(exp_term * cos_term, axis=-1)              # (B,Q,n)
            return jnp.sum(self.mixture_weights[..., None] * comp, axis=-2)
        tau = x1[..., :, None, :] - x2[..., None, :, :]                # (B,n,m,d)
        tau = tau[..., None, :, :, :]                                  # (B,1,n,m,d)
        scales = self.mixture_scales[..., None, :]                     # (B,Q,1,1,d)
        means = self.mixture_means[..., None, :]
        exp_term = jnp.exp(-2 * math.pi**2 * tau**2 * scales**2)
        cos_term = jnp.cos(2 * math.pi * tau * means)
        comp = jnp.prod(exp_term * cos_term, axis=-1)                  # (B,Q,n,m)
        return jnp.sum(self.mixture_weights[..., None, None] * comp, axis=-3)


class ScaleKernel(Kernel):
    """k(x,y) = s · k_base(x,y) with positive outputscale s per batch element
    (gpytorch ScaleKernel; used by handle_covar_, projected_lmc.py:159-167)."""

    def __init__(self, base_kernel: Kernel, batch_shape=None, dtype=jnp.float32):
        b = base_kernel.batch if batch_shape is None else int(batch_shape)
        self._setup(b, None)
        self.base_kernel = base_kernel
        self.raw_outputscale = jnp.full((b,), constraints.inv_softplus(jnp.asarray(1.0, dtype)), dtype)

    @property
    def has_lengthscale(self):
        return self.base_kernel.has_lengthscale

    @property
    def outputscale(self):
        return constraints.softplus(self.raw_outputscale)

    @property
    def lengthscale(self):
        return self.base_kernel.lengthscale

    def set_lengthscale(self, value):
        return self.replace(base_kernel=self.base_kernel.set_lengthscale(value))

    def __call__(self, x1, x2=None, diag=False):
        k = self.base_kernel(x1, x2, diag=diag)
        s = self.outputscale
        return k * (s[..., None] if diag else s[..., None, None])

    def forward(self, x1, x2, diag=False):  # pragma: no cover - __call__ overridden
        raise NotImplementedError

    def prior_log_prob(self):
        return self.base_kernel.prior_log_prob()

    def sub_kernels(self):
        return [self.base_kernel]


class AdditiveKernel(Kernel):
    """Sum of kernels — the additive `decomp` composition
    (projected_lmc.py:159-162: sum of ScaleKernels over variable subgroups)."""

    def __init__(self, kernels):
        self._setup(kernels[0].batch, None)
        self.kernels = list(kernels)

    def __call__(self, x1, x2=None, diag=False):
        out = self.kernels[0](x1, x2, diag=diag)
        for k in self.kernels[1:]:
            out = out + k(x1, x2, diag=diag)
        return out

    def forward(self, x1, x2, diag=False):  # pragma: no cover
        raise NotImplementedError

    def prior_log_prob(self):
        total = jnp.zeros(())
        for k in self.kernels:
            total = total + k.prior_log_prob()
        return total

    def sub_kernels(self):
        return list(self.kernels)


KERNEL_REGISTRY = {
    "rbf": RBFKernel,
    "matern": MaternKernel,
    "spline": SplineKernel,
    "spectral_mixture": SpectralMixtureKernel,
}


def handle_covar(kernel_type, dim: int, decomp=None, n_funcs: int = 1,
                 prior_scales=None, prior_width=None, outputscales: bool = True,
                 ker_kwargs=None, dtype=jnp.float32) -> Kernel:
    """Kernel factory mirroring ``handle_covar_`` (projected_lmc.py:107-181).

    Args mirror the reference: ``decomp=[[0,1],[1,2]]`` builds
    k1(x0,x1)+k2(x1,x2) with per-subkernel outputscales; lengthscale priors are
    Normal (1-d groups) or diagonal-MVN (multi-d groups) with mean
    ``prior_scales`` and deviation-to-mean ratio ``prior_width``; when priors
    are given, lengthscales are initialized at the prior mean.
    """
    if ker_kwargs is None:
        ker_kwargs = {}
    if isinstance(kernel_type, str):
        kernel_type = KERNEL_REGISTRY[kernel_type]
    if decomp is None:
        decomp = [list(range(dim))]
    decomp = [list(g) for g in decomp]

    priors = [None] * len(decomp)
    scales_per_ker = None
    if prior_scales is not None:
        if prior_width is None:
            raise ValueError("A prior width should be provided if a prior mean is")
        ps = prior_scales if isinstance(prior_scales, list) else \
            [np.asarray(prior_scales)[g] for g in decomp]
        pw = prior_width if isinstance(prior_width, list) else \
            [np.asarray(prior_width)[g] for g in decomp]
        scales_per_ker = ps
        for i, g in enumerate(decomp):
            loc = np.atleast_1d(np.asarray(ps[i], np.float64))
            width = np.atleast_1d(np.asarray(pw[i], np.float64))
            if len(g) > 1:
                priors[i] = MultivariateNormalPrior(loc, (loc * width))
            else:
                priors[i] = NormalPrior(loc, loc * width)

    kernels = []
    for i, g in enumerate(decomp):
        kwargs = dict(ard_num_dims=len(g), active_dims=g, batch_shape=n_funcs,
                      dtype=dtype, **ker_kwargs)
        ker = kernel_type(**kwargs)
        if ker.has_lengthscale:
            ker.lengthscale_prior = priors[i]
            if scales_per_ker is not None:
                ker = ker.set_lengthscale(
                    jnp.asarray(np.atleast_1d(scales_per_ker[i]), dtype))
        kernels.append(ker)

    if len(decomp) > 1:
        return AdditiveKernel([ScaleKernel(k, dtype=dtype) for k in kernels])
    if outputscales:
        return ScaleKernel(kernels[0], dtype=dtype)
    return kernels[0]
