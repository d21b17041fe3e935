"""Smoke tests: every script in examples/ must run end-to-end on CPU.

Each example is executed as a real subprocess (its own docstring-documented
invocation), so these tests also guard the documented entry points against
API drift.
"""

import os
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
EXAMPLES = os.path.join(REPO, "examples")


def _run(name, extra_env=None, timeout=900):
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    env["PYTHONPATH"] = REPO
    env.pop("PALLAS_AXON_POOL_IPS", None)
    env.update(extra_env or {})
    proc = subprocess.run([sys.executable, os.path.join(EXAMPLES, name)],
                          capture_output=True, text=True, timeout=timeout,
                          env=env, cwd=REPO)
    assert proc.returncode == 0, proc.stdout + "\n" + proc.stderr
    return proc.stdout


@pytest.mark.slow
def test_quickstart_projected():
    out = _run("01_quickstart_projected.py")
    assert "R2=" in out and "alpha_CI=" in out


@pytest.mark.slow
def test_sgpr_serving():
    out = _run("02_sgpr_serving.py")
    assert "cache == self-contained: True" in out


@pytest.mark.slow
def test_checkpoint_resume():
    out = _run("04_checkpoint_resume.py")
    assert "matches phase-1 final: True" in out
    assert "improved: True" in out


@pytest.mark.slow
def test_multichip_sharding():
    out = _run("03_multichip_sharding.py",
               {"XLA_FLAGS": "--xla_force_host_platform_device_count=8"})
    assert "match: True" in out
    assert "'data': 4" in out and "'latent': 2" in out
