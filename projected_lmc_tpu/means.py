"""Mean functions: Zero/Constant plus the reference's custom Linear/Polynomial
means (projected_lmc.py:37-81). All means are batched over ``n_funcs`` and map
inputs (n, d) -> (n_funcs, n)."""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from .module import Module


class Mean(Module):
    def __call__(self, x):
        raise NotImplementedError

    def basis_matrix(self, x):
        raise AttributeError(f"{type(self).__name__} has no basis_matrix")


class ZeroMean(Mean):
    def __init__(self, input_size=None, batch_shape=1, dtype=jnp.float32, **_):
        self.batch = int(batch_shape)
        self._dummy = jnp.zeros((0,), dtype)

    def __call__(self, x):
        x = jnp.asarray(x)
        n = x.shape[0]
        return jnp.zeros((self.batch, n), self._dummy.dtype)


class ConstantMean(Mean):
    def __init__(self, input_size=None, batch_shape=1, dtype=jnp.float32, **_):
        self.batch = int(batch_shape)
        self.constant = jnp.zeros((self.batch,), dtype)

    def __call__(self, x):
        n = jnp.asarray(x).shape[0]
        return jnp.broadcast_to(self.constant[:, None], (self.batch, n))


class LinearMean(Mean):
    """Affine mean x @ W + b (projected_lmc.py:65-81), randn-initialized as in
    the reference; ``basis_matrix`` returns [x, 1] for universal-kriging LOO."""

    def __init__(self, input_size, batch_shape=1, bias=True, seed: int = 0,
                 dtype=jnp.float32, **_):
        self.batch = int(batch_shape)
        rng = np.random.default_rng(seed)
        self.weights = jnp.asarray(rng.standard_normal((self.batch, int(input_size), 1)), dtype)
        self.bias = jnp.asarray(rng.standard_normal((self.batch, 1)), dtype) if bias else None

    def __call__(self, x):
        x = jnp.asarray(x)
        res = jnp.squeeze(jnp.matmul(x[None], self.weights), -1)  # (B, n)
        if self.bias is not None:
            res = res + self.bias
        return res

    def basis_matrix(self, x):
        x = jnp.asarray(x)
        return jnp.hstack([x, jnp.ones((x.shape[0], 1), x.dtype)])


class PolynomialMean(Mean):
    """Degree-d polynomial mean with per-degree weights (projected_lmc.py:37-63)."""

    def __init__(self, input_size, batch_shape=1, bias=True, degree: int = 3,
                 seed: int = 0, dtype=jnp.float32, **_):
        self.batch = int(batch_shape)
        self.degree = int(degree)
        rng = np.random.default_rng(seed)
        self.weights = jnp.asarray(
            rng.standard_normal((self.degree + 1, self.batch, int(input_size), 1)), dtype)
        self.bias = jnp.asarray(rng.standard_normal((self.batch, 1)), dtype) if bias else None

    def __call__(self, x):
        x = jnp.asarray(x)
        res = jnp.zeros((self.batch, x.shape[0]), x.dtype)
        for i in range(1, self.degree + 1):
            res = res + jnp.squeeze(jnp.matmul((x**i)[None], self.weights[i]), -1)
        if self.bias is not None:
            res = res + self.bias
        return res


MEAN_REGISTRY = {
    "zero": ZeroMean,
    "constant": ConstantMean,
    "linear": LinearMean,
    "polynomial": PolynomialMean,
}
