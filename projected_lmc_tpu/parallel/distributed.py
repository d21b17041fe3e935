"""Multi-host (multi-process) execution support.

The reference is single-process, single-device (SURVEY §2.4); the single-host
mesh layer lives in :mod:`.mesh`. This module adds the multi-host story: one
jax process per host, `jax.distributed` for control-plane rendezvous, and a
global ('data', 'latent') mesh laid out so the *latent* axis stays inside a
host's ICI domain (latent-batched Choleskys never cross hosts) while the
*data* axis spans hosts — data-parallel Gram/label reductions are the only
cross-host collectives, riding DCN-tolerant psums.

Typical use on each host of a v5p pod slice::

    from projected_lmc_tpu.parallel import distributed as dist
    dist.initialize()                      # env-driven (TPU pods auto-config)
    mesh = dist.make_global_mesh(latent=2) # all hosts' devices, one mesh
    step, params, opt, static = sharded_fit_step(model, mesh)

Single-host (or CPU-mesh testing) degenerates to :func:`.mesh.make_mesh`.
"""

from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh

from .mesh import make_mesh


def initialize(coordinator_address: str = None, num_processes: int = None,
               process_id: int = None) -> bool:
    """Initialize `jax.distributed` when running multi-process.

    On TPU pods all three arguments are discovered from the environment
    (``jax.distributed.initialize()`` with no args); pass them explicitly for
    CPU/GPU clusters. Returns True if distributed mode is active, False for
    the single-process fallback (already-initialized calls are idempotent).
    """
    # NOTE: do not touch jax.process_count()/jax.devices() before
    # jax.distributed.initialize — any backend-initializing call first makes
    # initialize() a hard error ("must be called before any JAX calls").
    from jax._src import distributed as _dist_state
    if getattr(_dist_state.global_state, "client", None) is not None:
        return jax.process_count() > 1          # already initialized
    if coordinator_address is not None:
        # explicit multi-process setup: let configuration errors surface
        jax.distributed.initialize(coordinator_address=coordinator_address,
                                   num_processes=num_processes,
                                   process_id=process_id)
        return jax.process_count() > 1
    try:
        jax.distributed.initialize()
        return jax.process_count() > 1
    except (ValueError, RuntimeError):
        # no coordinator configured in the environment -> single-process mode
        return False


def make_global_mesh(latent: int = None, data: int = None) -> Mesh:
    """('data', 'latent') mesh over ALL processes' devices.

    The latent axis is kept within each host's local devices (contiguous in
    the global device enumeration) so per-latent factorizations never cross
    the DCN; the data axis then spans hosts. Falls back to the single-host
    :func:`make_mesh` when there is one process.
    """
    if jax.process_count() == 1:
        return make_mesh(latent=latent, data=data)
    devices = jax.devices()                       # globally enumerated
    n = len(devices)
    local = jax.local_device_count()
    if latent is None:
        latent = 2 if local % 2 == 0 else 1
    if latent > local or local % latent != 0:
        raise ValueError(f"latent axis ({latent}) must divide the per-host "
                         f"device count ({local}) to stay inside ICI")
    if data is None:
        data = n // latent
    if latent * data != n:
        raise ValueError("mesh axes must multiply to the global device count")
    dev_array = np.asarray(devices).reshape(data, latent)
    return Mesh(dev_array, axis_names=("data", "latent"))


def is_coordinator() -> bool:
    """True on the process that should write checkpoints/CSVs."""
    return jax.process_index() == 0
