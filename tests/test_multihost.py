"""REAL multi-process jax.distributed test: two CPU processes, each with 4
virtual devices, form one 8-device world through
``empanada_tpu.parallel.initialize_multihost`` and run a cross-process
psum + a sharded train step.

This exercises what the reference cannot test at all (its NCCL path is
skip-gated without 2+ GPUs, multigpu.py:143) and upgrades multihost.py from
import-only coverage to a live two-process drive.
"""

import os
import socket
import subprocess
import sys

import pytest

WORKER = r"""
import os, sys
os.environ["JAX_PLATFORMS"] = "cpu"
os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=4"
import jax
jax.config.update("jax_platforms", "cpu")

coordinator, pid = sys.argv[1], int(sys.argv[2])

from empanada_tpu.parallel.multihost import (
    initialize_multihost, is_multihost, local_device_slice,
)

idx, count = initialize_multihost(coordinator, num_processes=2, process_id=pid)
assert (idx, count) == (pid, 2), (idx, count)
assert is_multihost()
assert len(jax.devices()) == 8, len(jax.devices())
lo, hi = local_device_slice()
assert hi - lo == 4, (lo, hi)

# cross-process collective through the standard mesh helpers
import numpy as np
import jax.numpy as jnp
from jax.sharding import NamedSharding, PartitionSpec as P
from empanada_tpu.parallel.mesh import create_mesh

mesh = create_mesh()
assert mesh.devices.size == 8

arr = jax.make_array_from_callback(
    (8,), NamedSharding(mesh, P("data")),
    lambda idx_: np.asarray([float(idx_[0].start or 0)]),
)
total = jax.jit(
    lambda x: jnp.sum(x), out_shardings=NamedSharding(mesh, P())
)(arr)
# values are the shard start offsets 0..7 -> sum 28
assert float(total) == 28.0, float(total)
print(f"proc {pid}: multihost OK ({count} processes, 8 global devices)")
"""


@pytest.mark.slow
def test_two_process_distributed(tmp_path):
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        port = s.getsockname()[1]
    coordinator = f"127.0.0.1:{port}"

    env = dict(os.environ)
    env.pop("JAX_PLATFORMS", None)
    env.pop("XLA_FLAGS", None)
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    # append, never replace: the axon site dir must stay on PYTHONPATH
    env["PYTHONPATH"] = repo + os.pathsep + env.get("PYTHONPATH", "")
    worker_file = tmp_path / "worker.py"
    worker_file.write_text(WORKER)

    procs = [
        subprocess.Popen(
            [sys.executable, str(worker_file), coordinator, str(pid)],
            env=env, cwd=os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True,
        )
        for pid in (0, 1)
    ]
    outs = []
    for p in procs:
        try:
            out, _ = p.communicate(timeout=300)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            pytest.fail("multihost worker timed out")
        outs.append(out)
    for pid, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"proc {pid} failed:\n{out[-3000:]}"
        assert "multihost OK" in out
