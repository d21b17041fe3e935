"""Kernel-layer tests: analytic values, composition factory, Pallas parity."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from projected_lmc_tpu.kernels import (RBFKernel, MaternKernel, SplineKernel,
                                       SpectralMixtureKernel, ScaleKernel,
                                       AdditiveKernel, handle_covar)
from projected_lmc_tpu.ops.pallas_kernels import fused_kernel_matrix


class TestStationary:
    def test_rbf_analytic(self):
        k = RBFKernel(ard_num_dims=1, batch_shape=1).set_lengthscale(2.0)
        x = np.array([[0.0], [1.0]])
        K = np.asarray(k(x))
        np.testing.assert_allclose(K[0, 0, 1], np.exp(-0.5 / 4.0), rtol=1e-6)
        np.testing.assert_allclose(np.diag(K[0]), 1.0, rtol=1e-7)

    def test_matern_analytic(self):
        x = np.array([[0.0], [0.7]])
        r = 0.7
        for nu, expected in [
            (0.5, np.exp(-r)),
            (1.5, (1 + np.sqrt(3) * r) * np.exp(-np.sqrt(3) * r)),
            (2.5, (1 + np.sqrt(5) * r + 5 * r**2 / 3) * np.exp(-np.sqrt(5) * r)),
        ]:
            k = MaternKernel(nu=nu, ard_num_dims=1).set_lengthscale(1.0)
            np.testing.assert_allclose(float(k(x)[0, 0, 1]), expected, rtol=1e-6)

    def test_ard_and_diag_consistency(self):
        rng = np.random.default_rng(0)
        x = rng.standard_normal((10, 3))
        k = MaternKernel(nu=2.5, ard_num_dims=3, batch_shape=2)
        k = k.set_lengthscale(jnp.asarray([[0.5, 1.0, 2.0], [1.0, 1.0, 1.0]]).reshape(2, 1, 3))
        K = np.asarray(k(x))
        d = np.asarray(k(x, diag=True))
        np.testing.assert_allclose(d, np.stack([np.diag(K[0]), np.diag(K[1])]),
                                   atol=1e-12)

    def test_spline_matches_reference_formula(self):
        """SplineKernel vs the literal formula at projected_lmc.py:26-35."""
        rng = np.random.default_rng(1)
        x1 = rng.random((6, 2))
        x2 = rng.random((5, 2))
        k = SplineKernel(batch_shape=1)
        K = np.asarray(k(x1, x2))[0]
        mins = np.minimum(x1[:, None, :], x2[None, :, :])
        maxs = np.maximum(x1[:, None, :], x2[None, :, :])
        expected = np.prod(1 + mins * maxs + 0.5 * mins**2 * (maxs - mins / 3), axis=-1)
        np.testing.assert_allclose(K, expected, rtol=1e-12)
        d = np.asarray(k(x1, diag=True))[0]
        np.testing.assert_allclose(d, np.prod(1 + x1**2 + x1**3 / 3, axis=-1),
                                   rtol=1e-12)

    def test_spectral_mixture_psd_and_stationary(self):
        rng = np.random.default_rng(2)
        x = np.sort(rng.random(12))[:, None]
        k = SpectralMixtureKernel(num_mixtures=3, ard_num_dims=1, batch_shape=1)
        k = k.initialize_from_data(x, rng.standard_normal(12))
        K = np.asarray(k(x))[0]
        np.testing.assert_allclose(K, K.T, atol=1e-10)
        assert np.linalg.eigvalsh(K).min() > -1e-8
        d = np.asarray(k(x, diag=True))[0]
        np.testing.assert_allclose(d, np.diag(K), atol=1e-10)


class TestFactory:
    def test_decomp_additive(self):
        """decomp=[[0,1],[1,2]] -> k1(x0,x1)+k2(x1,x2), each scaled
        (projected_lmc.py:117,159-162)."""
        cov = handle_covar(RBFKernel, dim=3, decomp=[[0, 1], [1, 2]], n_funcs=2)
        assert isinstance(cov, AdditiveKernel)
        assert len(cov.kernels) == 2
        assert all(isinstance(k, ScaleKernel) for k in cov.kernels)
        rng = np.random.default_rng(3)
        x = rng.standard_normal((7, 3))
        K = np.asarray(cov(x))
        k1 = np.asarray(cov.kernels[0](x))
        k2 = np.asarray(cov.kernels[1](x))
        np.testing.assert_allclose(K, k1 + k2, rtol=1e-12)
        # active dims actually differ
        x2 = x.copy()
        x2[:, 2] += 1.0  # only affects the second subkernel
        np.testing.assert_allclose(np.asarray(cov.kernels[0](x2)), k1, rtol=1e-12)

    def test_prior_scales_initialize_lengthscales(self):
        ps = np.array([0.3, 0.6, 0.9])
        cov = handle_covar(MaternKernel, dim=3, prior_scales=ps,
                           prior_width=np.array([1.0, 1.0, 1.0]),
                           outputscales=True, n_funcs=1)
        np.testing.assert_allclose(np.asarray(cov.lengthscale)[0, 0], ps, rtol=1e-5)
        # prior log prob is finite and differentiable
        lp = cov.prior_log_prob()
        assert np.isfinite(float(lp))

    def test_prior_width_required(self):
        with pytest.raises(ValueError):
            handle_covar(RBFKernel, dim=2, prior_scales=np.array([1.0, 1.0]))

    def test_outputscale(self):
        cov = handle_covar(RBFKernel, dim=1, outputscales=True, n_funcs=3)
        assert isinstance(cov, ScaleKernel)
        x = np.linspace(0, 1, 5)[:, None]
        K = np.asarray(cov(x))
        assert K.shape == (3, 5, 5)


class TestSpectralMixtureE2E:
    def test_spectral_mixture_init_and_periodic_fit(self):
        """initialize_from_data (gpytorch heuristic) + exact-GP training
        recovers a periodic signal — the tidal experiment's kernel path."""
        import projected_lmc_tpu as pl
        from projected_lmc_tpu.models.exact import ExactGPModel
        from projected_lmc_tpu.training import fit
        rng = np.random.default_rng(0)
        X = np.linspace(0, 4, 120)[:, None]
        y = np.sin(2 * np.pi * 1.5 * X[:, 0]) + 0.05 * rng.standard_normal(120)
        lik = pl.GaussianLikelihood(batch_shape=1, dtype=jnp.float64)
        m = ExactGPModel(jnp.asarray(X), jnp.asarray(y), lik, n_tasks=1,
                         kernel_type="spectral_mixture", mean_type="zero",
                         ker_kwargs=dict(num_mixtures=3))
        m = m.replace(covar_module=m.covar_module.initialize_from_data(X, y))
        # init sanity: means below Nyquist, scales positive
        means = np.asarray(m.covar_module.mixture_means)
        nyq = 0.5 / np.diff(np.sort(X[:, 0])).min()
        assert np.all(means <= nyq + 1e-6) and np.all(means > 0)
        m2, info = fit(m, n_iter=300, lr=0.05, patience=60)
        post = m2.posterior(jnp.asarray(X), full_cov=False)
        rmse = float(np.sqrt(np.mean((np.asarray(post.mean)[0]
                                      - np.sin(2 * np.pi * 1.5 * X[:, 0]))**2)))
        assert rmse < 0.15, rmse


class TestStationaryCustomVJP:
    """stationary_kernel_matrix: the analytic backward (matvec-sized
    contractions via the (x_i−x_j)² expansion) vs autodiff of the naive
    formula, per profile kind, in fp64."""

    @pytest.mark.parametrize("kind", ["rbf", "matern05", "matern15", "matern25"])
    def test_value_and_grads_match_autodiff(self, kind):
        from projected_lmc_tpu.kernels import (stationary_kernel_matrix,
                                               _profile, _sqdist)
        rng = np.random.default_rng(0)
        # coincident rows exercise the r=0 subgradient
        x1 = jnp.asarray(rng.uniform(-1, 1, (17, 3)))
        x2 = jnp.concatenate([x1[:5], jnp.asarray(rng.uniform(-1, 1, (8, 3)))])
        ls = jnp.asarray(rng.uniform(0.5, 2.0, (2, 1, 3)))
        R = jnp.asarray(rng.standard_normal((2, 17, 13)))

        mu = jnp.mean(x1, axis=0)  # same centering as the op: bitwise-equal
        # d2, so r=0 pairs stay exactly at 0 (Matern-1/2 has infinite slope
        # there and would amplify oracle-side cancellation noise otherwise)

        def naive(a, b, l):
            return _profile(_sqdist((a - mu)[None] / l, (b - mu)[None] / l),
                            kind)

        K = stationary_kernel_matrix(x1, x2, ls, kind)
        np.testing.assert_allclose(np.asarray(K), np.asarray(naive(x1, x2, ls)),
                                   rtol=1e-12, atol=1e-12)

        f_custom = lambda a, b, l: jnp.sum(
            R * stationary_kernel_matrix(a, b, l, kind))
        f_naive = lambda a, b, l: jnp.sum(R * naive(a, b, l))
        g_c = jax.grad(f_custom, argnums=(0, 1, 2))(x1, x2, ls)
        g_n = jax.grad(f_naive, argnums=(0, 1, 2))(x1, x2, ls)
        for a, b, name in zip(g_c, g_n, ("dx1", "dx2", "dls")):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       rtol=1e-8, atol=1e-9, err_msg=name)

    def test_scalar_lengthscale_grads_match_autodiff(self):
        """Non-ARD (B,1,1) lengthscale with d>1 inputs: the custom VJP must
        sum the per-dimension lengthscale cotangents (ADVICE round-1 fix)."""
        from projected_lmc_tpu.kernels import (stationary_kernel_matrix,
                                               _profile, _sqdist)
        rng = np.random.default_rng(3)
        x1 = jnp.asarray(rng.uniform(-1, 1, (11, 4)))
        x2 = jnp.asarray(rng.uniform(-1, 1, (9, 4)))
        ls = jnp.asarray(rng.uniform(0.5, 2.0, (3, 1, 1)))   # scalar per batch
        R = jnp.asarray(rng.standard_normal((3, 11, 9)))
        mu = jnp.mean(x1, axis=0)

        def naive(a, b, l):
            return _profile(_sqdist((a - mu)[None] / l, (b - mu)[None] / l),
                            "matern25")

        K = stationary_kernel_matrix(x1, x2, ls, "matern25")
        np.testing.assert_allclose(np.asarray(K), np.asarray(naive(x1, x2, ls)),
                                   rtol=1e-12, atol=1e-12)
        f_custom = lambda a, b, l: jnp.sum(
            R * stationary_kernel_matrix(a, b, l, "matern25"))
        f_naive = lambda a, b, l: jnp.sum(R * naive(a, b, l))
        g_c = jax.grad(f_custom, argnums=(0, 1, 2))(x1, x2, ls)
        g_n = jax.grad(f_naive, argnums=(0, 1, 2))(x1, x2, ls)
        for a, b, name in zip(g_c, g_n, ("dx1", "dx2", "dls")):
            assert a.shape == b.shape, name
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       rtol=1e-8, atol=1e-9, err_msg=name)

    def test_slabbed_backward_matches_monolithic(self):
        """_skm_bwd_slabbed (the >2GB memory-pressure path, including a slab
        size that does NOT divide n) == the monolithic reductions."""
        from projected_lmc_tpu import kernels as km
        rng = np.random.default_rng(7)
        n, m, B, d = 530, 40, 3, 2   # n prime-ish: exercises padding
        x1 = jnp.asarray(rng.standard_normal((n, d)).astype(np.float32))
        x2 = jnp.asarray(rng.standard_normal((m, d)).astype(np.float32))
        ls = jnp.asarray(rng.uniform(0.5, 2.0, (B, 1, d)).astype(np.float32))
        g = jnp.asarray(rng.standard_normal((B, n, m)).astype(np.float32))
        rows_s, cols_s, Wx2_s, Wtx1_s = km._skm_bwd_slabbed(
            "matern25", x1, x2, ls, g)
        d2 = km._sqdist(x1[None] / ls, x2[None] / ls)
        W = g * km._dprofile(d2, "matern25")
        np.testing.assert_allclose(np.asarray(rows_s), np.asarray(W.sum(-1)),
                                   rtol=2e-5, atol=1e-5)
        np.testing.assert_allclose(np.asarray(cols_s), np.asarray(W.sum(-2)),
                                   rtol=2e-5, atol=1e-5)
        np.testing.assert_allclose(
            np.asarray(Wx2_s), np.asarray(jnp.einsum("bij,jd->bid", W, x2)),
            rtol=2e-5, atol=1e-5)
        np.testing.assert_allclose(
            np.asarray(Wtx1_s), np.asarray(jnp.einsum("bij,id->bjd", W, x1)),
            rtol=2e-5, atol=1e-5)

    def test_centering_beats_naive_at_large_offsets(self):
        """Inputs with a large common offset (datetime-like features): the
        centered op keeps coincident pairs at exactly K=1 where the naive
        |x|²+|y|²−2xy expansion loses digits to cancellation."""
        from projected_lmc_tpu.kernels import stationary_kernel_matrix
        rng = np.random.default_rng(0)
        x = jnp.asarray(rng.uniform(-1, 1, (10, 2)) + 1e6)
        ls = jnp.ones((1, 1, 2))
        K = np.asarray(stationary_kernel_matrix(x, x, ls, "rbf"))
        # 1 ulp slack (matmul vs norm-sum reduction order); the uncentered
        # expansion at this offset is off by ~1e-4
        np.testing.assert_allclose(np.diag(K[0]), 1.0, rtol=0, atol=1e-15)

    def test_kernel_call_routes_through_custom_op(self):
        """RBF/Matern __call__ on 2-D inputs gives identical values and
        lengthscale gradients as the generic 3-D batched path."""
        rng = np.random.default_rng(1)
        x = rng.uniform(-1, 1, (30, 2))
        ker = MaternKernel(nu=2.5, ard_num_dims=2, batch_shape=3,
                           dtype=jnp.float64).set_lengthscale(
            jnp.asarray(rng.uniform(0.5, 2.0, (3, 1, 2))))
        K2d = ker(x)
        xb = jnp.broadcast_to(jnp.asarray(x)[None], (3, 30, 2))
        K3d = ker.forward(xb, xb)
        np.testing.assert_allclose(np.asarray(K2d), np.asarray(K3d),
                                   rtol=1e-10, atol=1e-12)
        g2 = jax.grad(lambda k: jnp.sum(k(x) ** 2))(ker).raw_lengthscale
        g3 = jax.grad(lambda k: jnp.sum(k.forward(xb, xb) ** 2))(ker).raw_lengthscale
        np.testing.assert_allclose(np.asarray(g2), np.asarray(g3),
                                   rtol=1e-8, atol=1e-10)

    def test_active_dims_and_1d_inputs(self):
        rng = np.random.default_rng(2)
        x = rng.uniform(-1, 1, (20, 4))
        ker = RBFKernel(ard_num_dims=2, batch_shape=1, active_dims=(1, 3))
        Ka = np.asarray(ker(x))
        Kb = np.asarray(ker.forward(jnp.asarray(x[:, [1, 3]])[None],
                                    jnp.asarray(x[:, [1, 3]])[None]))
        np.testing.assert_allclose(Ka, Kb, rtol=1e-12)
        k1 = RBFKernel(ard_num_dims=1)
        x1d = jnp.asarray(rng.uniform(-1, 1, 15))
        np.testing.assert_allclose(np.asarray(k1(x1d)),
                                   np.asarray(k1(x1d[:, None])), rtol=1e-12)


class TestPallasParity:
    @pytest.mark.parametrize("kind,maker", [
        ("rbf", lambda: RBFKernel(ard_num_dims=3, batch_shape=2)),
        ("matern25", lambda: MaternKernel(nu=2.5, ard_num_dims=3, batch_shape=2)),
        ("matern15", lambda: MaternKernel(nu=1.5, ard_num_dims=3, batch_shape=2)),
    ])
    def test_fused_matches_reference(self, kind, maker):
        rng = np.random.default_rng(0)
        x1 = rng.standard_normal((140, 3)).astype(np.float32)
        x2 = rng.standard_normal((70, 3)).astype(np.float32)
        ker = maker().set_lengthscale(
            jnp.asarray([[0.5, 1.0, 2.0], [1.5, 0.7, 0.9]]).reshape(2, 1, 3))
        ref = np.asarray(ker(x1, x2))
        got = np.asarray(fused_kernel_matrix(
            jnp.asarray(x1), jnp.asarray(x2),
            ker.lengthscale.astype(jnp.float32), kind, True))
        np.testing.assert_allclose(got, ref, atol=5e-6, rtol=5e-5)

    def test_fused_gradient_matches_reference(self):
        """The custom VJP of the Pallas op == autodiff of the XLA path, so
        use_pallas=True is trainable (ADVICE r1: pallas_call has no VJP)."""
        import jax
        from projected_lmc_tpu.ops.pallas_kernels import xla_kernel_matrix
        rng = np.random.default_rng(1)
        x1 = jnp.asarray(rng.standard_normal((40, 3)).astype(np.float32))
        x2 = jnp.asarray(rng.standard_normal((30, 3)).astype(np.float32))
        ls = jnp.asarray(rng.uniform(0.5, 2.0, (2, 1, 3)).astype(np.float32))
        g1 = jax.grad(lambda l: jnp.sum(
            fused_kernel_matrix(x1, x2, l, "matern25", True) ** 2))(ls)
        g2 = jax.grad(lambda l: jnp.sum(
            xla_kernel_matrix(x1, x2, l, "matern25") ** 2))(ls)
        np.testing.assert_allclose(np.asarray(g1), np.asarray(g2),
                                   rtol=1e-4, atol=1e-4)


if __name__ == "__main__":
    pytest.main([__file__, "-x", "-q"])
