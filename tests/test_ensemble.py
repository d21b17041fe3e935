"""Seed-parallel ensemble training (training.fit_ensemble).

The reference's seeded-study protocol (experiments.py:125-127) trains 30–50
independent runs sequentially; fit_ensemble batches same-config models into
ONE vmapped jit program. These tests pin (a) numerical equivalence with the
sequential fit() per seed, (b) the same-config guard, (c) the eval hook, and
(d) the static-attr rewriting + value-equality plumbing that makes two
seeded builds treedef-compatible.
"""

import numpy as np
import pytest

import projected_lmc_tpu  # noqa: F401  (conftest env)
from projected_lmc_tpu.constraints import GreaterThan, Interval, Positive
from projected_lmc_tpu.mlls import projected_lmc_mll
from projected_lmc_tpu.models.projected import ProjectedGPModel
from projected_lmc_tpu.module import map_static_attr
from projected_lmc_tpu.training import fit, fit_ensemble


def _make_model(seed, n=40, p=4, q=2, **kw):
    r = np.random.default_rng(seed)
    X = np.linspace(-1, 1, n)[:, None].astype("float32")
    F = np.stack([np.sin(3 * X[:, 0]), np.cos(2 * X[:, 0])], 1)
    W = r.standard_normal((q, p)).astype("float32")
    Y = (F @ W + 0.05 * r.standard_normal((n, p))).astype("float32")
    return ProjectedGPModel(X, Y, p, q, init_lmc_coeffs=True,
                            kernel_type="matern", seed=seed, **kw)


class TestConstraintEquality:
    def test_value_eq_and_hash(self):
        assert GreaterThan(1e-4) == GreaterThan(1e-4)
        assert hash(GreaterThan(1e-4)) == hash(GreaterThan(1e-4))
        assert GreaterThan(1e-4) != GreaterThan(1e-3)
        assert Positive() == Positive()
        assert Interval(0.0, 1.0) == Interval(0.0, 1.0)
        assert Interval(0.0, 1.0) != Interval(0.0, 2.0)
        assert GreaterThan(0.0) != Positive()

    def test_seeded_builds_treedef_equal(self):
        import jax
        a, b = _make_model(0), _make_model(1)
        assert jax.tree_util.tree_structure(a) == \
            jax.tree_util.tree_structure(b)


class TestMapStaticAttr:
    def test_rewrites_nested_kernel_flag(self):
        m = _make_model(0)
        off = map_static_attr(m, "use_pallas", False)

        flags = []

        def walk(node):
            from projected_lmc_tpu.module import Module
            if isinstance(node, Module):
                if "use_pallas" in node.__dict__:
                    flags.append(node.use_pallas)
                for v in node.__dict__.values():
                    walk(v)
            elif isinstance(node, (list, tuple)):
                for v in node:
                    walk(v)
            elif isinstance(node, dict):
                for v in node.values():
                    walk(v)

        walk(off)
        assert flags and not any(flags)
        # original untouched
        flags2 = []

        def walk2(node, out=flags2):
            from projected_lmc_tpu.module import Module
            if isinstance(node, Module):
                if "use_pallas" in node.__dict__:
                    out.append(node.use_pallas)
                for v in node.__dict__.values():
                    walk2(v, out)
            elif isinstance(node, (list, tuple)):
                for v in node:
                    walk2(v, out)
            elif isinstance(node, dict):
                for v in node.values():
                    walk2(v, out)

        walk2(m)
        assert any(flags2)


class TestFitEnsemble:
    def test_matches_sequential_fit(self):
        """Each seed's batched trajectory == its sequential fit()."""
        models = [_make_model(s) for s in (0, 1, 2)]
        trained, info = fit_ensemble(models, projected_lmc_mll, n_iter=30,
                                     lr=0.03, scan_steps=10)
        assert info["losses"].shape == (30, 3)
        m_seq, info_seq = fit(models[1], projected_lmc_mll, n_iter=30,
                              lr=0.03, scan_steps=10)
        l_ens = info["losses"][:, 1]
        l_seq = np.asarray(info_seq["losses"])
        np.testing.assert_allclose(l_ens, l_seq, rtol=1e-4, atol=1e-5)
        # final predictions agree
        me, _ = trained[1].predict(models[1].train_x, observed=True)
        ms, _ = m_seq.predict(models[1].train_x, observed=True)
        np.testing.assert_allclose(np.asarray(me), np.asarray(ms),
                                   rtol=1e-3, atol=1e-4)

    def test_per_seed_plateau_and_batch_stop(self):
        models = [_make_model(s) for s in (0, 1)]
        trained, info = fit_ensemble(models, projected_lmc_mll, n_iter=40,
                                     lr=1e-9, scan_steps=10,
                                     loss_thresh=1e-2, patience=3)
        # lr ~0: both seeds plateau immediately -> batch stops early,
        # per-seed n_iter records each seed's own plateau point
        assert info["losses"].shape[0] < 40
        assert all(int(k) <= info["losses"].shape[0]
                   for k in info["n_iter"])

    def test_config_mismatch_raises(self):
        a = _make_model(0)
        b = _make_model(1, scalar_B=True, diagonal_B=True, BDN=True,
                        diagonal_R=True)
        with pytest.raises(ValueError, match="architecture"):
            fit_ensemble([a, b], projected_lmc_mll, n_iter=5)


class TestEvalHook:
    def test_eval_every_records_trajectory(self):
        m = _make_model(0)
        seen = []

        def eval_fn(model, i):
            mean, _ = model.predict(m.train_x, observed=True)
            seen.append(i)
            return float(np.mean(np.asarray(mean)))

        _, info = fit(m, projected_lmc_mll, n_iter=30, lr=0.03,
                      scan_steps=10, eval_every=10, eval_fn=eval_fn)
        assert "evals" in info
        iters = [i for i, _ in info["evals"]]
        assert iters == seen
        assert iters[0] >= 10 and iters[-1] >= 30 - 10
        assert len(iters) == len(set(iters))  # no duplicate final eval
