"""Test configuration: run everything on a virtual 8-device CPU mesh in x64.

The container's sitecustomize (on PYTHONPATH) registers and eagerly
initializes the tunneled 'axon' TPU backend in every interpreter, so setting
JAX_PLATFORMS here is too late — we must also reset jax's backend caches to
re-resolve onto CPU with the forced host-device count.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = flags + " --xla_force_host_platform_device_count=8"
os.environ["JAX_ENABLE_X64"] = "1"

import jax  # noqa: E402

jax.config.update("jax_enable_x64", True)
jax.config.update("jax_platforms", "cpu")

if jax.default_backend() != "cpu" or len(jax.devices()) < 8:
    from jax._src import xla_bridge as _xb
    _xb._clear_backends()
    _xb.get_backend.cache_clear()
    assert jax.default_backend() == "cpu", jax.default_backend()
    assert len(jax.devices()) == 8, jax.devices()
