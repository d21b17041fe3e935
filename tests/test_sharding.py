"""Sharding tests on the virtual 8-device CPU mesh: sharded results must equal
single-device results, and the mesh layer must produce valid shardings for
every model family."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

import projected_lmc_tpu as pl
from projected_lmc_tpu.mlls import projected_lmc_mll
from projected_lmc_tpu.parallel.mesh import make_mesh, shard_model, model_shardings
from projected_lmc_tpu.parallel.sharded import sharded_fit_step, dryrun_step


def make_data(n=64, p=6, q=2, seed=0):
    rng = np.random.default_rng(seed)
    X = np.linspace(-1, 1, n)[:, None]
    U = np.stack([np.sin(3 * X[:, 0]), np.cos(5 * X[:, 0])][:q], axis=1)
    H = rng.standard_normal((q, p))
    Y = U @ H + 0.05 * rng.standard_normal((n, p))
    return X, Y


@pytest.fixture(scope="module")
def mesh():
    assert len(jax.devices()) >= 8
    return make_mesh(8)


class TestSharding:
    def test_mesh_axes(self, mesh):
        assert mesh.shape["data"] * mesh.shape["latent"] == 8

    def test_projected_loss_matches_unsharded(self, mesh):
        X, Y = make_data()
        m = pl.ProjectedGPModel(X, Y, Y.shape[1], 2, init_lmc_coeffs=True,
                                kernel_type="matern")
        unsharded = float(projected_lmc_mll(m))
        ms = shard_model(m, mesh)
        sharded = float(jax.jit(projected_lmc_mll)(ms))
        np.testing.assert_allclose(sharded, unsharded, rtol=1e-10)

    def test_sgpr_data_parallel_loss_matches(self, mesh):
        X, Y = make_data(n=64)
        m = pl.ProjectedGPModel(X, Y, Y.shape[1], 2, init_lmc_coeffs=True,
                                kernel_type="matern", n_inducing_points=10)
        unsharded = float(projected_lmc_mll(m))
        ms = shard_model(m, mesh)
        sharded = float(jax.jit(projected_lmc_mll)(ms))
        np.testing.assert_allclose(sharded, unsharded, rtol=1e-9)

    def test_sharded_step_equals_unsharded_step(self, mesh):
        """One full sharded AdamW update == one single-device update."""
        from projected_lmc_tpu.module import trainable_mask, partition, combine
        import optax

        X, Y = make_data(n=32)
        m = pl.ProjectedGPModel(X, Y, Y.shape[1], 2, init_lmc_coeffs=True,
                                kernel_type="matern")

        # single-device reference step
        mask = trainable_mask(m)
        params, static = partition(m, mask)
        tx = optax.adamw(1e-2, weight_decay=1e-2)  # match sharded_fit_step
        opt = tx.init(params)
        loss_ref, grads = jax.value_and_grad(
            lambda p: -projected_lmc_mll(combine(p, static)))(params)

        step, params_s, opt_s, static_s = sharded_fit_step(
            m, mesh, projected_lmc_mll, lr=1e-2)
        params_s2, _, loss_sh = step(params_s, opt_s, static_s)
        np.testing.assert_allclose(float(loss_sh), float(loss_ref), rtol=1e-10)

        updates, _ = tx.update(grads, opt, params)
        params_ref = optax.apply_updates(params, updates)
        for a, b in zip(jax.tree_util.tree_leaves(params_ref),
                        jax.tree_util.tree_leaves(params_s2)):
            # cross-device reduction order perturbs gradients at the ulp level,
            # which adam's rsqrt amplifies — compare to 1e-4 relative
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       rtol=1e-4, atol=1e-8)

    def test_dryrun_multichip_entrypoint(self):
        import importlib.util
        spec = importlib.util.spec_from_file_location(
            "graft_entry", "/root/repo/__graft_entry__.py")
        mod = importlib.util.module_from_spec(spec)
        spec.loader.exec_module(mod)
        mod.dryrun_multichip(8)

    def test_lmc_iterative_mll_matches_unsharded(self, mesh):
        """The bench hot path (matrix-free Nyström-PCG exact-LMC MLL,
        ops/iterative.py:lmc_pcg_log_prob) sharded over the 8-device mesh at
        n=2048 equals the single-device value: same key → same probes, so the
        only differences are cross-device reduction orders."""
        rng = np.random.default_rng(5)
        n, T, q = 2048, 6, 2
        X = rng.uniform(-1, 1, (n, 3))
        Y = rng.standard_normal((n, T))
        m = pl.MultitaskGPModel(X, Y, n_tasks=T, n_latents=q,
                                model_type="LMC", kernel_type="matern",
                                mean_type="zero", fix_diagonal=True)
        key = jax.random.PRNGKey(0)
        mll = lambda mm: mm.mll(key=key, iterative=True, precond_rank=64,
                                num_probes=4, max_cg_iters=32, cg_tol=1e-8)
        unsharded = float(jax.jit(mll)(m))
        ms = shard_model(m, mesh)
        sharded = float(jax.jit(mll)(ms))
        assert np.isfinite(sharded)
        np.testing.assert_allclose(sharded, unsharded, rtol=1e-6)

    def test_lmc_iterative_grads_match_unsharded(self, mesh):
        """Gradient pass (custom VJP with Hutchinson terms) under sharding."""
        from projected_lmc_tpu.module import trainable_mask, partition, combine
        rng = np.random.default_rng(6)
        n, T, q = 512, 4, 2
        X = rng.uniform(-1, 1, (n, 2))
        Y = rng.standard_normal((n, T))
        m = pl.MultitaskGPModel(X, Y, n_tasks=T, n_latents=q,
                                model_type="LMC", kernel_type="matern",
                                mean_type="zero", fix_diagonal=True)
        key = jax.random.PRNGKey(1)

        def loss(p, static):
            return -combine(p, static).mll(
                key=key, iterative=True, precond_rank=32, num_probes=4,
                max_cg_iters=32, cg_tol=1e-8)

        mask = trainable_mask(m)
        p0, s0 = partition(m, mask)
        g_ref = jax.jit(jax.grad(loss))(p0, s0)
        ms = shard_model(m, mesh)
        p1, s1 = partition(ms, mask)
        g_sh = jax.jit(jax.grad(loss))(p1, s1)
        for a, b in zip(jax.tree_util.tree_leaves(g_ref),
                        jax.tree_util.tree_leaves(g_sh)):
            np.testing.assert_allclose(np.asarray(b), np.asarray(a),
                                       rtol=1e-5, atol=1e-10)

    def test_icm_mll_matches_unsharded(self, mesh):
        """ICM joint-diagonalization MLL (ops/kron.py icm_log_prob_chol)
        sharded == unsharded."""
        rng = np.random.default_rng(7)
        n, T, q = 256, 5, 3
        X = rng.uniform(-1, 1, (n, 2))
        Y = rng.standard_normal((n, T))
        m = pl.MultitaskGPModel(X, Y, n_tasks=T, n_latents=q,
                                model_type="ICM", kernel_type="matern")
        unsharded = float(jax.jit(lambda mm: mm.mll())(m))
        ms = shard_model(m, mesh)
        sharded = float(jax.jit(lambda mm: mm.mll())(ms))
        np.testing.assert_allclose(sharded, unsharded, rtol=1e-8)

    def test_icm_iterative_mll_matches_unsharded(self, mesh):
        """The matrix-free ICM PCG path (large-n exact ICM) under the mesh
        == single-device, same probes."""
        rng = np.random.default_rng(11)
        n, t, q = 128, 4, 2
        X = rng.uniform(-1, 1, (n, 2))
        Y = rng.standard_normal((n, t))
        lik = pl.MultitaskGaussianLikelihood(num_tasks=t, rank=0)
        m = pl.MultitaskGPModel(X, Y, lik, n_tasks=t, n_latents=q,
                                model_type="ICM", kernel_type="matern",
                                seed=0)
        key = jax.random.PRNGKey(2)
        kw = dict(key=key, iterative=True, precond_rank=16, num_probes=4,
                  max_cg_iters=40, cg_tol=1e-8)
        unsharded = float(m.mll(**kw))
        ms = shard_model(m, mesh)
        sharded = float(jax.jit(lambda mm: mm.mll(**kw))(ms))
        np.testing.assert_allclose(sharded, unsharded, rtol=1e-8)

    def test_variational_sharding(self, mesh):
        X, Y = make_data(n=48)
        m = pl.VariationalMultitaskGPModel(X, n_latents=2, n_tasks=Y.shape[1],
                                           train_y=Y, init_lmc_coeffs=True,
                                           kernel_type="matern", mean_type="zero")
        unsharded = float(m.elbo())
        ms = shard_model(m, mesh)
        sharded = float(jax.jit(lambda mm: mm.elbo())(ms))
        np.testing.assert_allclose(sharded, unsharded, rtol=1e-9)


class TestShardedPrediction:
    """Shard-vs-unsharded equality for the PREDICTION paths (VERDICT r2
    item 6): training coverage alone does not establish that the posterior
    math (cross-covariances, cached factorizations, Kronecker variance)
    survives pjit propagation over the mesh."""

    def test_projected_predict_matches_unsharded(self, mesh):
        X, Y = make_data(n=64)
        Xt = np.linspace(-0.9, 0.9, 24)[:, None]
        m = pl.ProjectedGPModel(X, Y, Y.shape[1], 2, init_lmc_coeffs=True,
                                kernel_type="matern")
        mean_ref, var_ref = m.predict(Xt, observed=True)
        ms = shard_model(m, mesh)
        mean_sh, var_sh = jax.jit(
            lambda mm, xs: mm.predict(xs, observed=True))(ms, jnp.asarray(Xt))
        np.testing.assert_allclose(np.asarray(mean_sh), np.asarray(mean_ref),
                                   rtol=1e-8, atol=1e-10)
        np.testing.assert_allclose(np.asarray(var_sh), np.asarray(var_ref),
                                   rtol=1e-8, atol=1e-10)

    def test_projected_prediction_cache_matches_unsharded(self, mesh):
        """The serving path: cache built under the mesh, then repeated
        cached predicts — the cache pytree itself crosses the jit boundary."""
        X, Y = make_data(n=64)
        Xt = np.linspace(-0.9, 0.9, 16)[:, None]
        m = pl.ProjectedGPModel(X, Y, Y.shape[1], 2, init_lmc_coeffs=True,
                                kernel_type="matern")
        cache_ref = m.prediction_cache()
        mean_ref, var_ref = m.predict(Xt, observed=True, cache=cache_ref)
        ms = shard_model(m, mesh)
        cache_sh = jax.jit(lambda mm: mm.prediction_cache())(ms)
        mean_sh, var_sh = jax.jit(
            lambda mm, c, xs: mm.predict(xs, observed=True, cache=c))(
            ms, cache_sh, jnp.asarray(Xt))
        np.testing.assert_allclose(np.asarray(mean_sh), np.asarray(mean_ref),
                                   rtol=1e-8, atol=1e-10)
        np.testing.assert_allclose(np.asarray(var_sh), np.asarray(var_ref),
                                   rtol=1e-8, atol=1e-10)

    def test_icm_compute_var_matches_unsharded(self, mesh):
        """ICM Kronecker-eig posterior variance (compute_var,
        projected_lmc.py:591-640) under the mesh."""
        rng = np.random.default_rng(13)
        n, T, q = 96, 5, 2
        X = rng.uniform(-1, 1, (n, 2))
        Y = rng.standard_normal((n, T))
        Xt = rng.uniform(-1, 1, (20, 2))
        m = pl.MultitaskGPModel(X, Y, n_tasks=T, n_latents=q,
                                model_type="ICM", kernel_type="matern")
        var_ref = np.asarray(m.compute_var(Xt))
        ms = shard_model(m, mesh)
        var_sh = jax.jit(lambda mm, xs: mm.compute_var(xs))(
            ms, jnp.asarray(Xt))
        np.testing.assert_allclose(np.asarray(var_sh), var_ref,
                                   rtol=1e-7, atol=1e-9)

    def test_icm_posterior_cache_matches_unsharded(self, mesh):
        """ICM posterior through the explicit precompute_posterior cache."""
        rng = np.random.default_rng(17)
        n, T, q = 96, 4, 2
        X = rng.uniform(-1, 1, (n, 2))
        Y = rng.standard_normal((n, T))
        Xt = rng.uniform(-1, 1, (12, 2))
        m = pl.MultitaskGPModel(X, Y, n_tasks=T, n_latents=q,
                                model_type="ICM", kernel_type="matern")
        cache = m.precompute_posterior()
        pred_ref = m.posterior(Xt, cache=cache, observed=True)
        ms = shard_model(m, mesh)
        cache_sh = jax.jit(lambda mm: mm.precompute_posterior())(ms)
        pred_sh = jax.jit(
            lambda mm, c, xs: mm.posterior(xs, cache=c, observed=True))(
            ms, cache_sh, jnp.asarray(Xt))
        np.testing.assert_allclose(np.asarray(pred_sh.mean),
                                   np.asarray(pred_ref.mean),
                                   rtol=1e-7, atol=1e-9)
        np.testing.assert_allclose(np.asarray(pred_sh.variance),
                                   np.asarray(pred_ref.variance),
                                   rtol=1e-7, atol=1e-9)

    def test_lmc_iterative_posterior_matches_unsharded(self, mesh):
        """The large-n serving path: matrix-free LMC posterior cache (PCG
        mean + Nyström conservative variance) under the mesh."""
        rng = np.random.default_rng(19)
        n, T, q = 256, 4, 2
        X = rng.uniform(-1, 1, (n, 2))
        Y = rng.standard_normal((n, T))
        Xt = rng.uniform(-1, 1, (16, 2))
        m = pl.MultitaskGPModel(X, Y, n_tasks=T, n_latents=q,
                                model_type="LMC", kernel_type="matern",
                                mean_type="zero", fix_diagonal=True)
        cache = m.precompute_posterior(iterative=True, precond_rank=32,
                                       max_cg_iters=200, cg_tol=1e-10)
        pred_ref = m.posterior(Xt, cache=cache, observed=True)
        ms = shard_model(m, mesh)
        cache_sh = jax.jit(lambda mm: mm.precompute_posterior(
            iterative=True, precond_rank=32, max_cg_iters=200,
            cg_tol=1e-10))(ms)
        pred_sh = jax.jit(
            lambda mm, c, xs: mm.posterior(xs, cache=c, observed=True))(
            ms, cache_sh, jnp.asarray(Xt))
        np.testing.assert_allclose(np.asarray(pred_sh.mean),
                                   np.asarray(pred_ref.mean),
                                   rtol=1e-5, atol=1e-8)
        np.testing.assert_allclose(np.asarray(pred_sh.variance),
                                   np.asarray(pred_ref.variance),
                                   rtol=1e-5, atol=1e-8)

    def test_variational_prediction_matches_unsharded(self, mesh):
        X, Y = make_data(n=48)
        Xt = np.linspace(-0.9, 0.9, 16)[:, None]
        m = pl.VariationalMultitaskGPModel(X, n_latents=2, n_tasks=Y.shape[1],
                                           train_y=Y, init_lmc_coeffs=True,
                                           kernel_type="matern",
                                           mean_type="zero")
        pred_ref = m(Xt, observed=True)
        ms = shard_model(m, mesh)
        pred_sh = jax.jit(lambda mm, xs: mm(xs, observed=True))(
            ms, jnp.asarray(Xt))
        np.testing.assert_allclose(np.asarray(pred_sh.mean),
                                   np.asarray(pred_ref.mean),
                                   rtol=1e-8, atol=1e-10)
        np.testing.assert_allclose(np.asarray(pred_sh.variance),
                                   np.asarray(pred_ref.variance),
                                   rtol=1e-8, atol=1e-10)


class TestShardingReport:
    """Pins model_shardings' per-leaf decisions for every model family.

    model_shardings classifies leaves by path-name + shape heuristics;
    a mis-classified leaf silently replicates — correct but unsharded
    (a performance bug). These tests turn that into a failure: for each
    family, the leaves that carry the parallel work MUST get their
    expected rule, and nothing in the latent scopes may fall through to
    'replicated' while being latent-batched."""

    @staticmethod
    def _report(m, mesh):
        from projected_lmc_tpu.parallel.mesh import sharding_report
        return sharding_report(m, mesh)

    def _assert_rules(self, rep, expected):
        for path_frag, rule in expected:
            hits = {p: r for p, (s, r) in rep.items() if path_frag in p}
            assert hits, f"no leaf matching {path_frag!r} in report"
            assert any(r == rule for r in hits.values()), \
                f"{path_frag!r}: expected rule {rule!r}, got {hits}"

    def test_projected_report(self, mesh):
        X, Y = make_data(n=64)
        m = pl.ProjectedGPModel(X, Y, Y.shape[1], 2, init_lmc_coeffs=True,
                                kernel_type="matern")
        rep = self._report(m, mesh)
        self._assert_rules(rep, [
            ("train_x", "data-rows"),
            ("covar_module", "latent-batch"),       # per-latent lengthscales
            ("likelihood", "latent-batch"),         # per-latent noises
            ("train_y", "latent-by-data"),          # projected targets (q, n)
        ])

    def test_multitask_report(self, mesh):
        X, Y = make_data(n=64)
        m = pl.MultitaskGPModel(
            X, Y[:, :4], pl.MultitaskGaussianLikelihood(num_tasks=4),
            n_tasks=4, n_latents=2, model_type="LMC", kernel_type="matern")
        rep = self._report(m, mesh)
        self._assert_rules(rep, [
            ("train_x", "data-rows"),
            ("covar_module", "latent-batch"),
        ])

    def test_variational_report(self, mesh):
        X, Y = make_data(n=48)
        m = pl.VariationalMultitaskGPModel(
            X, n_latents=2, n_tasks=Y.shape[1], train_y=Y,
            init_lmc_coeffs=True, kernel_type="matern", mean_type="zero")
        rep = self._report(m, mesh)
        self._assert_rules(rep, [
            ("train_x", "data-rows"),
            ("covar_module", "latent-batch"),
            ("var_mean", "latent-batch"),
            ("var_chol", "latent-batch"),
        ])

    def test_no_silent_latent_replication(self, mesh):
        """Any 2-D+ leaf under a latent scope whose leading dim == q must be
        latent-sharded, not replicated (divisibility holds: q=2 on a
        latent-axis-2 mesh)."""
        X, Y = make_data(n=64)
        m = pl.ProjectedGPModel(X, Y, Y.shape[1], 2, init_lmc_coeffs=True,
                                kernel_type="matern")
        rep = self._report(m, mesh)
        scopes = ("covar_module", "likelihood", "mean_module")
        leaves = {p: l for (p, l) in zip(
            [".".join(map(str, [getattr(k, 'name', getattr(k, 'key', k))
                                for k in path]))
             for path, _ in jax.tree_util.tree_flatten_with_path(m)[0]],
            jax.tree_util.tree_leaves(m))}
        for path, (spec, rule) in rep.items():
            leaf = leaves.get(path)
            if leaf is None or not hasattr(leaf, "ndim") or leaf.ndim == 0:
                continue
            in_scope = any(s in path for s in scopes)
            if in_scope and leaf.shape[0] == 2:
                assert rule in ("latent-batch", "latent-by-data"), \
                    (path, rule, leaf.shape)


if __name__ == "__main__":
    pytest.main([__file__, "-x", "-q"])
