"""Fused stationary-kernel exact-LMC MLL (ops/fused_mll.py) vs the composed
path (kernels.stationary_kernel_matrix → iterative.lmc_pcg_log_prob).

Both run the identical estimator on the identical probes, so values and
gradients must agree to numerical precision — this is an algebra-refactoring
check, not a statistical one. The Pallas tile kernels are checked in
interpret mode against the dense XLA references.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from projected_lmc_tpu import kernels as kmod
from projected_lmc_tpu.ops import fused_mll
from projected_lmc_tpu.ops import iterative as it
from projected_lmc_tpu.ops import pallas_kernels as pk


def make_problem(n=48, t=5, q=3, d=2, seed=0, dtype=jnp.float64):
    rng = np.random.default_rng(seed)
    x = jnp.asarray(rng.uniform(-1, 1, (n, d)), dtype)
    ls = jnp.asarray(rng.uniform(0.4, 1.5, (q, 1, d)), dtype)
    os_ = jnp.asarray(rng.uniform(0.5, 2.0, (q,)), dtype)
    H = jnp.asarray(rng.standard_normal((t, q)), dtype)
    A = rng.standard_normal((t, t)) * 0.1
    St = jnp.asarray(A @ A.T + 0.5 * np.eye(t), dtype)
    Y = jnp.asarray(rng.standard_normal((n, t)), dtype)
    key = jax.random.PRNGKey(3)
    k1, k2 = jax.random.split(key)
    s, rank = 4, 16
    eps = jax.random.normal(k1, (s, n, t), dtype)
    xi = jax.random.normal(k2, (s, q, rank), dtype)
    return x, ls, os_, H, St, Y, eps, xi, rank


def composed_ll(x, ls, os_, H, St, Y, eps, xi, rank, kind="matern25"):
    Ks = kmod.stationary_kernel_matrix(x, x, ls, kind, False, None) \
        * os_[:, None, None]
    return it.lmc_pcg_log_prob(Ks, H, St, Y, eps, xi, None, 200, 1e-12,
                               False, rank)


def fused_ll(x, ls, os_, H, St, Y, eps, xi, rank, kind="matern25"):
    return fused_mll.lmc_pcg_log_prob_stationary(
        jax.lax.stop_gradient(x), ls, os_, H, St, Y, eps, xi, None, kind,
        200, 1e-12, False, rank)


class TestFusedVsComposed:
    @pytest.mark.parametrize("kind", ["rbf", "matern25", "matern15"])
    def test_value_identical(self, kind):
        args = make_problem()
        a = float(composed_ll(*args, kind=kind))
        b = float(fused_ll(*args, kind=kind))
        np.testing.assert_allclose(b, a, rtol=1e-10)

    @pytest.mark.parametrize("kind", ["rbf", "matern25"])
    def test_gradients_identical(self, kind):
        """Same estimator, same probes — the backward's low-rank refactoring
        must reproduce the composed path's gradients exactly (fp64)."""
        x, ls, os_, H, St, Y, eps, xi, rank = make_problem()
        gc = jax.grad(lambda *a: composed_ll(*a, eps, xi, rank, kind=kind),
                      argnums=(1, 2, 3, 4, 5))(x, ls, os_, H, St, Y)
        gf = jax.grad(lambda *a: fused_ll(*a, eps, xi, rank, kind=kind),
                      argnums=(1, 2, 3, 4, 5))(x, ls, os_, H, St, Y)
        for a, b, name in zip(gc, gf, ["ls", "os", "H", "St", "Y"]):
            np.testing.assert_allclose(
                np.asarray(b), np.asarray(a), rtol=1e-7, atol=1e-9,
                err_msg=f"cotangent mismatch for {name}")

    def test_scalar_lengthscale(self):
        """Non-ARD (q,1,1) lengthscale with d>1 inputs: the dls reduction
        sums over feature dims (round-1 advisor finding, kept covered)."""
        x, _, os_, H, St, Y, eps, xi, rank = make_problem(d=3)
        rng = np.random.default_rng(7)
        ls = jnp.asarray(rng.uniform(0.5, 1.2, (3, 1, 1)), x.dtype)
        gc = jax.grad(lambda l: composed_ll(x, l, os_, H, St, Y, eps, xi,
                                            rank))(ls)
        gf = jax.grad(lambda l: fused_ll(x, l, os_, H, St, Y, eps, xi,
                                         rank))(ls)
        np.testing.assert_allclose(np.asarray(gf), np.asarray(gc), rtol=1e-7)

    def test_model_routes_through_fused(self):
        """MultitaskGPModel LMC: fused-spec route (use_pallas=True kernels)
        equals the composed route (use_pallas=False) in value and parameter
        gradients."""
        from projected_lmc_tpu.models.multitask import (MultitaskGPModel,
                                                        _fused_stationary_spec)
        rng = np.random.default_rng(1)
        n, t, q = 40, 4, 2
        X = rng.uniform(-1, 1, (n, 3))
        Y = rng.standard_normal((n, t))
        kw = dict(n_tasks=t, n_latents=q, model_type="LMC",
                  kernel_type="matern", fix_diagonal=True, seed=0)
        m_fused = MultitaskGPModel(X, Y, **kw)
        m_comp = MultitaskGPModel(X, Y, **kw)
        m_comp = m_comp.replace(
            covar_module=m_comp.covar_module.replace(use_pallas=False))
        assert _fused_stationary_spec(m_fused.covar_module, 3) is not None
        assert _fused_stationary_spec(m_comp.covar_module, 3) is None
        key = jax.random.PRNGKey(0)
        kwargs = dict(key=key, iterative=True, max_cg_iters=200,
                      cg_tol=1e-12, precond_rank=16, num_probes=4)
        v1 = float(m_fused.mll(**kwargs))
        v2 = float(m_comp.mll(**kwargs))
        np.testing.assert_allclose(v1, v2, rtol=1e-10)

        def loss(raw_ls, covar_factor, model):
            m = model.replace(
                covar_module=model.covar_module.replace(
                    raw_lengthscale=raw_ls),
                covar_factor=covar_factor)
            return m.mll(**kwargs)

        g1 = jax.grad(loss, argnums=(0, 1))(
            m_fused.covar_module.raw_lengthscale, m_fused.covar_factor,
            m_fused)
        g2 = jax.grad(loss, argnums=(0, 1))(
            m_comp.covar_module.raw_lengthscale, m_comp.covar_factor, m_comp)
        for a, b in zip(g1, g2):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       rtol=1e-6, atol=1e-10)


class TestPallasInterpret:
    """Tile kernels vs their dense XLA references (interpret mode, fp32)."""

    def test_scaled_stack(self):
        rng = np.random.default_rng(0)
        x = jnp.asarray(rng.uniform(-1, 1, (70, 3)).astype(np.float32))
        ls = jnp.asarray(rng.uniform(0.5, 1.5, (2, 1, 3)).astype(np.float32))
        os_ = jnp.asarray(np.float32([0.7, 1.9]))
        got = pk.scaled_kernel_stack(x, x, ls, os_, "matern25", True)
        want = pk.xla_kernel_matrix(x, x, ls, "matern25") * os_[:, None, None]
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   rtol=1e-5, atol=1e-6)

    def test_lowrank_reduce(self):
        rng = np.random.default_rng(1)
        n, d, B, r = 90, 2, 3, 5
        x = jnp.asarray(rng.uniform(-1, 1, (n, d)).astype(np.float32))
        ls = jnp.asarray(rng.uniform(0.5, 1.5, (B, 1, d)).astype(np.float32))
        A = jnp.asarray(rng.standard_normal((B, n, r)).astype(np.float32))
        Bf = jnp.asarray(rng.standard_normal((B, n, r)).astype(np.float32))
        rows, wx = pk.lowrank_stationary_reduce(x, ls, A, Bf, "rbf",
                                                interpret=True)
        a = x[None] / ls
        n1 = jnp.sum(a * a, axis=-1)
        d2 = jnp.maximum(n1[..., :, None] + n1[..., None, :]
                         - 2.0 * jnp.matmul(a, jnp.swapaxes(a, -1, -2)), 0.0)
        W = jnp.einsum("bik,bjk->bij", A, Bf) * pk._dprofile("rbf", d2)
        np.testing.assert_allclose(np.asarray(rows),
                                   np.asarray(jnp.sum(W, -1)),
                                   rtol=1e-4, atol=1e-4)
        np.testing.assert_allclose(np.asarray(wx),
                                   np.asarray(jnp.einsum("bij,jd->bid", W, x)),
                                   rtol=1e-4, atol=1e-4)
