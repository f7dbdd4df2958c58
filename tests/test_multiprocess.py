"""Multi-host input sharding, exercised in REAL multi-process mode.

VERDICT r1 missing #5: the jax.process_count() > 1 branch of
parallel.mesh.shard_host_local_batch (make_array_from_process_local_data)
had no CI exercise. Here two OS processes form a jax.distributed CPU
cluster (4 virtual devices each -> 8 global); each contributes its LOCAL
half of the global batch and the jitted global sum must see every row
exactly once."""

import os
import socket
import subprocess
import sys

import pytest

_WORKER = r"""
import os, sys
sys.path.insert(0, os.getcwd())      # repo root (python /tmp/worker.py)
import jax
jax.config.update("jax_platforms", "cpu")
jax.distributed.initialize(
    coordinator_address=sys.argv[1],
    num_processes=2,
    process_id=int(sys.argv[2]),
)
import numpy as np
from lipreading_tpu.config import MeshConfig
from lipreading_tpu.parallel.mesh import make_mesh, shard_host_local_batch

assert jax.process_count() == 2, jax.process_count()
assert jax.device_count() == 8 and jax.local_device_count() == 4
mesh = make_mesh(MeshConfig(data_parallel=8))
pid = jax.process_index()
# global batch rows 0..7; this process holds rows [4*pid, 4*pid+4)
local = {"x": (np.arange(4)[:, None] + 4 * pid) * np.ones((1, 3), np.float32)}
g = shard_host_local_batch(local, mesh)
assert g["x"].shape == (8, 3), g["x"].shape
total = jax.jit(lambda x: x.sum())(g["x"])
assert float(total) == float(sum(range(8)) * 3), float(total)
# and a data-parallel computation consumes it: per-row mean, allgathered
from jax.experimental import multihost_utils
rows = jax.jit(lambda x: x.mean(axis=1))(g["x"])
rows_all = multihost_utils.process_allgather(rows, tiled=True)
np.testing.assert_allclose(np.asarray(rows_all),
                           np.arange(8, dtype=np.float32))
print(f"OK process {pid}")
"""


def test_two_process_input_sharding(tmp_path):
    port = socket.socket()
    port.bind(("localhost", 0))
    addr = f"localhost:{port.getsockname()[1]}"
    port.close()

    env = dict(os.environ)
    env["PALLAS_AXON_POOL_IPS"] = ""          # keep the axon backend out
    env["JAX_PLATFORMS"] = "cpu"
    env["XLA_FLAGS"] = "--xla_force_host_platform_device_count=4"
    env.pop("PYTHONPATH", None)
    root = os.path.join(os.path.dirname(__file__), "..")

    script = tmp_path / "worker.py"
    script.write_text(_WORKER)
    procs = [
        subprocess.Popen(
            [sys.executable, str(script), addr, str(pid)],
            env=env, cwd=root,
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True,
        )
        for pid in range(2)
    ]
    outs = []
    for p in procs:
        try:
            out, _ = p.communicate(timeout=300)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            pytest.fail("multi-process workers timed out")
        outs.append(out)
    for pid, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"process {pid} failed:\n{out}"
        assert f"OK process {pid}" in out, out
