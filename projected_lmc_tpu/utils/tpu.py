"""Tunneled-TPU session helpers.

The container's sitecustomize registers an 'axon' PJRT plugin per process; if
a previous process died mid-claim, registration fails silently and jax is
left with no TPU backend ("Backend 'axon' is not in the list of known
backends"). :func:`ensure_tpu` re-attempts registration with fresh session
ids until the claim clears — call it at the top of any TPU-facing script.
No-op when jax already has devices (including plain CPU runs).
"""

from __future__ import annotations

import os
import time


def ensure_tpu(max_wait_s: float = 240) -> bool:
    """Block until ``jax.devices()`` works; returns True if a TPU is up.

    Also points jax at the repo-local persistent compilation cache — the
    tunneled AOT compiler takes minutes for large graphs, so every
    TPU-facing entry point should reuse compiled executables across runs."""
    repo_root = os.path.dirname(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))))
    os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                          os.path.join(repo_root, ".jax_cache"))
    os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "5")
    import jax
    # the env var is only read at jax import; callers that imported jax
    # before calling us still get the cache via the config route
    jax.config.update("jax_compilation_cache_dir",
                      os.environ["JAX_COMPILATION_CACHE_DIR"])
    jax.config.update("jax_persistent_cache_min_compile_time_secs",
                      float(os.environ["JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS"]))
    deadline = time.time() + max_wait_s
    while True:
        try:
            devs = jax.devices()
            return any(d.platform == "tpu" for d in devs)
        except RuntimeError:
            if time.time() > deadline:
                raise
        try:
            import uuid
            from axon.register import register
            gen = os.environ.get("PALLAS_AXON_TPU_GEN", "v5e")
            register(None, f"{gen}:1x1x1", so_path="/opt/axon/libaxon_pjrt.so",
                     session_id=str(uuid.uuid4()),
                     remote_compile=os.environ.get(
                         "PALLAS_AXON_REMOTE_COMPILE") == "1")
            from jax._src import xla_bridge as xb
            xb._clear_backends()
            xb.get_backend.cache_clear()
        except Exception:
            time.sleep(15)
