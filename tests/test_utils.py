"""Coverage for the session utilities (utils/profiling.py, utils/tpu.py).

The reference measures wall-clock only (experiments.py:261,284,316,331);
profiling.Timer mirrors that bracketing and profile_trace adds optional
jax.profiler traces. ensure_tpu is the tunneled-session bootstrap — on a
CPU-only test host it must return False quickly while still pointing jax at
the persistent compilation cache.
"""

import os
import time

import jax
import pytest

from projected_lmc_tpu.utils import Timer, ensure_tpu, profile_trace


class TestTimer:
    def test_elapsed_measures_wall_clock(self):
        with Timer() as t:
            time.sleep(0.01)
        assert t.elapsed >= 0.01
        assert t.elapsed < 5.0

    def test_exception_propagates_and_still_records(self):
        t = Timer()
        with pytest.raises(ValueError):
            with t:
                raise ValueError("boom")
        assert hasattr(t, "elapsed")


class TestProfileTrace:
    def test_disabled_is_noop(self):
        ran = []
        with profile_trace(enabled=False):
            ran.append(1)
        assert ran == [1]

    def test_enabled_writes_trace(self, tmp_path):
        logdir = str(tmp_path / "trace")
        with profile_trace(logdir=logdir, enabled=True):
            jax.block_until_ready(jax.numpy.ones(8) * 2)
        # jax.profiler writes plugins/profile/<ts>/*.trace.json.gz (or .xplane.pb)
        produced = [
            os.path.join(root, f)
            for root, _, files in os.walk(logdir)
            for f in files
        ]
        assert produced, f"no trace artifacts under {logdir}"


class TestEnsureTpu:
    def test_cpu_host_returns_false_and_sets_cache(self, monkeypatch):
        # jax already has (CPU) devices in the test session, so the claim
        # loop is never entered; the call must return promptly.
        monkeypatch.delenv("JAX_COMPILATION_CACHE_DIR", raising=False)
        start = time.time()
        assert ensure_tpu(max_wait_s=1) is False
        assert time.time() - start < 30
        cache_dir = os.environ.get("JAX_COMPILATION_CACHE_DIR")
        assert cache_dir and cache_dir.endswith(".jax_cache")
        assert jax.config.jax_compilation_cache_dir == cache_dir
