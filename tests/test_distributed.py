"""Multi-host DCN layer test: a real 2-process jax.distributed CPU cluster.

Exercises ``parallel/distributed.py`` (SURVEY §5.8) end to end: coordinator
bring-up from env vars, process/device topology, ``local_batch_slice``, and a
cross-process psum over a global mesh — the collective that replaces the
reference's folder-walking metric aggregation (``global_utils.py:297-318``).

Subprocesses unset ``PALLAS_AXON_POOL_IPS`` so the axon TPU plugin's
sitecustomize hook does not register (two processes must not claim the single
real chip); with the plugin absent, ``JAX_PLATFORMS=cpu`` is honored normally.
"""

import json
import os
import socket
import subprocess
import sys

import pytest

_WORKER = r"""
import json, os, sys
sys.path.insert(0, os.environ["REPO_ROOT"])
import numpy as np
from soccerplayershapepose_tpu.parallel.distributed import (
    initialize, local_batch_slice)

info = initialize()
import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

pid = info["process_id"]
start, size = local_batch_slice(8)

mesh = Mesh(np.array(jax.devices()), ("data",))
sharding = NamedSharding(mesh, P("data"))
n_global = len(jax.devices())
per_proc = n_global // info["num_processes"]
# Global array [1..n_global], each process contributing its slice.
local = (np.arange(per_proc) + pid * per_proc + 1).astype(np.float32)
arr = jax.make_array_from_process_local_data(sharding, local, (n_global,))
total = jax.jit(jnp.sum, out_shardings=NamedSharding(mesh, P()))(arr)
print("RESULT " + json.dumps({
    "process_id": pid,
    "num_processes": info["num_processes"],
    "global_devices": info["global_devices"],
    "local_devices": info["local_devices"],
    "slice": [start, size],
    "psum": float(total),
}))
"""


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        return s.getsockname()[1]


@pytest.mark.slow
def test_two_process_cpu_cluster(tmp_path):
    port = _free_port()
    procs = []
    for pid in range(2):
        env = dict(os.environ)
        env.pop("PALLAS_AXON_POOL_IPS", None)   # no axon plugin registration
        env.pop("JAX_PLATFORMS", None)
        env.update({
            "JAX_PLATFORMS": "cpu",
            "XLA_FLAGS": "--xla_force_host_platform_device_count=2",
            "JAX_COORDINATOR_ADDRESS": f"127.0.0.1:{port}",
            "JAX_NUM_PROCESSES": "2",
            "JAX_PROCESS_ID": str(pid),
            "REPO_ROOT": os.path.dirname(os.path.dirname(
                os.path.abspath(__file__))),
            "JAX_COMPILATION_CACHE_DIR": "/tmp/jax_cache",
        })
        procs.append(subprocess.Popen(
            [sys.executable, "-c", _WORKER], env=env,
            stdout=subprocess.PIPE, stderr=subprocess.PIPE, text=True))

    results = {}
    for p in procs:
        out, err = p.communicate(timeout=300)
        assert p.returncode == 0, f"worker failed:\n{out}\n{err}"
        line = [ln for ln in out.splitlines() if ln.startswith("RESULT ")][-1]
        r = json.loads(line[len("RESULT "):])
        results[r["process_id"]] = r

    assert sorted(results) == [0, 1]
    for pid, r in results.items():
        assert r["num_processes"] == 2
        assert r["local_devices"] == 2
        assert r["global_devices"] == 4
        # 8-sample global batch → 4 per host.
        assert r["slice"] == [pid * 4, 4]
        # sum(1..4) over the full cross-process array.
        assert r["psum"] == 10.0
