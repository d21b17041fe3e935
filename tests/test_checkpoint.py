"""Checkpoint / resume round-trips (utils/checkpoint.py) and the fit() hook."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

import projected_lmc_tpu as pl
from projected_lmc_tpu.utils.checkpoint import (save_model, load_model,
                                                save_orbax, load_orbax)
from projected_lmc_tpu.training import fit


def _model(seed=0):
    rng = np.random.default_rng(seed)
    X = np.linspace(-1, 1, 24)[:, None]
    U = np.stack([np.sin(3 * X[:, 0]), np.cos(5 * X[:, 0])], axis=1)
    Y = U @ rng.standard_normal((2, 5)) + 0.05 * rng.standard_normal((24, 5))
    return pl.ProjectedGPModel(X, Y, 5, 2, init_lmc_coeffs=True,
                               kernel_type="matern")


def _assert_models_equal(a, b):
    la, lb = jax.tree_util.tree_leaves(a), jax.tree_util.tree_leaves(b)
    assert len(la) == len(lb)
    for x, y in zip(la, lb):
        np.testing.assert_allclose(np.asarray(x), np.asarray(y), rtol=0,
                                   atol=0)


def test_npz_round_trip(tmp_path):
    m = _model()
    path = str(tmp_path / "ckpt.npz")
    save_model(m, path)
    # perturb a template and restore — must equal the original exactly
    tmpl = _model(seed=3)
    restored = load_model(tmpl, path)
    _assert_models_equal(m, restored)


def test_npz_mismatch_is_loud(tmp_path):
    m = _model()
    path = str(tmp_path / "ckpt.npz")
    save_model(m, path)
    other = pl.ProjectedGPModel(np.asarray(m.train_x),
                                np.asarray(m.train_y_tasks), 5, 2,
                                init_lmc_coeffs=True, kernel_type="matern",
                                BDN=False)   # extra M/B params -> keys differ
    with pytest.raises(ValueError, match="mismatch"):
        load_model(other, path)


def test_fit_checkpoints_and_resume(tmp_path):
    m = _model()
    path = str(tmp_path / "train_ckpt.npz")
    trained, info = fit(m, n_iter=5, lr=1e-2, checkpoint_every=2,
                        checkpoint_path=path, scan_steps=1)
    restored = load_model(_model(seed=9), path)
    # the final checkpoint equals the returned trained model
    _assert_models_equal(trained, restored)
    # and training can resume from it
    resumed, info2 = fit(restored, n_iter=2, lr=1e-2, scan_steps=1)
    assert np.isfinite(info2["loss"])


def test_orbax_round_trip(tmp_path):
    try:
        import orbax.checkpoint  # noqa: F401
    except ImportError:
        pytest.skip("orbax not installed")
    m = _model()
    path = str(tmp_path / "orbax_ckpt")
    save_orbax(m, path)
    restored = load_orbax(_model(seed=5), path)
    _assert_models_equal(m, restored)
