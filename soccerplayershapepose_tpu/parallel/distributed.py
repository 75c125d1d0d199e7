"""Multi-host (DCN) initialization for clip-scale data parallelism.

SURVEY.md §5.8: the reference has no distributed execution; the TPU-native
design scales player/clip batches with in-slice ICI meshes (parallel/mesh.py)
and standard multi-host data parallelism across DCN. This module is the thin
entry point: call :func:`initialize` once per host process before any jax
computation; then ``make_mesh()`` sees every host's devices and
``shard_batch`` places each host's slice of the global batch.
"""

from __future__ import annotations

import os
from typing import Optional


def initialize(coordinator_address: Optional[str] = None,
               num_processes: Optional[int] = None,
               process_id: Optional[int] = None) -> dict:
    """Initialize jax.distributed from args or standard env vars.

    Env fallbacks: JAX_COORDINATOR_ADDRESS, JAX_NUM_PROCESSES,
    JAX_PROCESS_ID (also understands MEGASCALE/TPU pod env autodetection —
    passing nothing lets jax autodetect on Cloud TPU pods).

    Returns {'process_id', 'num_processes', 'local_devices',
    'global_devices'} for logging. No-op (single process) when neither args
    nor env provide a coordinator.
    """
    import jax

    coordinator_address = coordinator_address or os.environ.get(
        "JAX_COORDINATOR_ADDRESS")
    if num_processes is None and "JAX_NUM_PROCESSES" in os.environ:
        num_processes = int(os.environ["JAX_NUM_PROCESSES"])
    if process_id is None and "JAX_PROCESS_ID" in os.environ:
        process_id = int(os.environ["JAX_PROCESS_ID"])

    if coordinator_address or num_processes:
        jax.distributed.initialize(
            coordinator_address=coordinator_address,
            num_processes=num_processes,
            process_id=process_id)
    # On Cloud TPU pods jax.distributed.initialize() with no args
    # autodetects; a bare single-host run skips initialization entirely.

    return {"process_id": jax.process_index(),
            "num_processes": jax.process_count(),
            "local_devices": len(jax.local_devices()),
            "global_devices": len(jax.devices())}


def local_batch_slice(global_batch: int) -> tuple[int, int]:
    """(start, size) of this host's slice of a DCN-data-parallel batch."""
    import jax
    per_host = global_batch // jax.process_count()
    return jax.process_index() * per_host, per_host
