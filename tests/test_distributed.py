"""Multi-host (2-process) validation of parallel/distributed.py.

Spawns two real OS processes that rendezvous through jax.distributed (gloo
CPU collectives), build the global ('data','latent') mesh with the latent
axis kept host-local, and run one data-parallel reduction plus a sharded GP
MLL whose value must match the single-process result. This is the only way
to exercise make_global_mesh's multi-process branch — in-process jax always
has process_count() == 1.
"""

import os
import socket
import subprocess
import sys

import numpy as np
import pytest

WORKER = r"""
import os, sys
os.environ["JAX_PLATFORMS"] = "cpu"
os.environ.pop("PALLAS_AXON_POOL_IPS", None)
flags = [f for f in os.environ.get("XLA_FLAGS", "").split()
         if "host_platform_device_count" not in f]
os.environ["XLA_FLAGS"] = " ".join(flags + ["--xla_force_host_platform_device_count=2"])
sys.path.insert(0, "/root/repo")

import jax
jax.config.update("jax_cpu_collectives_implementation", "gloo")
import jax.numpy as jnp
import numpy as np

from projected_lmc_tpu.parallel import distributed as dist

addr, pid = sys.argv[1], int(sys.argv[2])
ok = dist.initialize(coordinator_address=addr, num_processes=2, process_id=pid)
assert ok and jax.process_count() == 2, (ok, jax.process_count())
assert len(jax.devices()) == 4 and jax.local_device_count() == 2

mesh = dist.make_global_mesh(latent=2)
assert dict(mesh.shape) == {"data": 2, "latent": 2}, dict(mesh.shape)
# latent axis must be host-local: both devices of each mesh row on one process
for row in mesh.devices:
    assert len({d.process_index for d in row}) == 1, "latent axis crosses hosts"

# data-parallel reduction across hosts through the mesh
from jax.sharding import NamedSharding, PartitionSpec as P
vals = np.arange(8, dtype=np.float32)                   # same on both processes
arr = jax.make_array_from_process_local_data(
    NamedSharding(mesh, P("data")), vals.reshape(2, 4)[pid][:, None][:, 0])
total = jax.jit(jnp.sum, out_shardings=NamedSharding(mesh, P()))(arr)
# fetch only the addressable shard (fully-replicated output)
got = float(np.asarray(total.addressable_data(0)))
assert got == float(vals.sum()), (got, float(vals.sum()))

# one sharded GP marginal likelihood over the global mesh == local value
import projected_lmc_tpu as pl
from projected_lmc_tpu.mlls import projected_lmc_mll
from projected_lmc_tpu.parallel.mesh import shard_model

rng = np.random.default_rng(0)
X = np.linspace(-1, 1, 32)[:, None].astype(np.float32)
U = np.stack([np.sin(3 * X[:, 0]), np.cos(5 * X[:, 0])], axis=1)
Y = (U @ rng.standard_normal((2, 6)) + 0.05 * rng.standard_normal((32, 6))
     ).astype(np.float32)
m = pl.ProjectedGPModel(X, Y, 6, 2, init_lmc_coeffs=True, kernel_type="matern")
ref = float(projected_lmc_mll(m))
ms = shard_model(m, mesh)
out = jax.jit(projected_lmc_mll)(ms)
val = float(np.asarray(out.addressable_data(0)))
assert abs(val - ref) < 1e-5 * max(abs(ref), 1.0), (val, ref)

if dist.is_coordinator():
    print("DIST_OK", got, val, flush=True)
"""


def _free_port():
    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    port = s.getsockname()[1]
    s.close()
    return port


def test_two_process_global_mesh(tmp_path):
    worker = tmp_path / "dist_worker.py"
    worker.write_text(WORKER)
    addr = f"127.0.0.1:{_free_port()}"
    env = dict(os.environ)
    env.pop("PALLAS_AXON_POOL_IPS", None)   # no TPU claim in the children
    procs = [subprocess.Popen([sys.executable, str(worker), addr, str(i)],
                              stdout=subprocess.PIPE, stderr=subprocess.PIPE,
                              text=True, env=env, cwd="/root/repo")
             for i in range(2)]
    outs = []
    try:
        for p in procs:
            out, err = p.communicate(timeout=240)
            outs.append((p.returncode, out, err))
    except subprocess.TimeoutExpired:
        for p in procs:
            p.kill()
        pytest.fail("distributed workers timed out")
    for rc, out, err in outs:
        assert rc == 0, f"worker failed (rc={rc}):\n{err[-3000:]}"
    assert any("DIST_OK" in out for _, out, _ in outs), outs
