"""Mesh construction and sharding helpers.

Design (SURVEY.md §5.8): a 2-D ``(data, model)`` ICI mesh.

* ``data`` shards the player-crop batch (pure data parallelism — the player
  axis is embarrassingly parallel; the reference loops over players serially
  on one GPU, global_var.py:12-17),
* ``model`` optionally shards the SMPL vertex axis (6890) and rasterizer
  pixel rows — the "sequence-parallel" analogue for this workload — plus the
  IEF hidden layers (tensor parallel). At these model sizes a model axis of
  1-2 is all that ever pays; the mesh defaults to pure DP.

All parallelism is expressed with ``jax.sharding.NamedSharding`` constraints
under ``jit`` (GSPMD inserts the psum/all-gather collectives); metric
aggregation that the reference does by folder-walking (global_utils.py:297)
becomes a ``psum`` over the data axis.
"""

from __future__ import annotations

import dataclasses
from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


@dataclasses.dataclass(frozen=True)
class MeshAxes:
    data: str = "data"
    model: str = "model"


AXES = MeshAxes()


def make_mesh(devices: Optional[Sequence] = None,
              model_parallel: int = 1) -> Mesh:
    """Build a (data, model) mesh over the given (or all) devices."""
    devices = list(devices if devices is not None else jax.devices())
    n = len(devices)
    assert n % model_parallel == 0, (n, model_parallel)
    grid = np.asarray(devices).reshape(n // model_parallel, model_parallel)
    return Mesh(grid, (AXES.data, AXES.model))


def data_sharding(mesh: Mesh, ndim: int = 1) -> NamedSharding:
    """Shard the leading (batch) axis over the data axis."""
    return NamedSharding(mesh, P(AXES.data, *([None] * (ndim - 1))))


def shard_batch(batch, mesh: Mesh):
    """Place a pytree of (B, ...) arrays with the batch axis sharded on data."""
    def put(x):
        return jax.device_put(x, data_sharding(mesh, np.ndim(x)))
    return jax.tree_util.tree_map(put, batch)


def replicate(tree, mesh: Mesh):
    """Fully replicate a pytree (parameters) over the mesh."""
    sharding = NamedSharding(mesh, P())
    return jax.tree_util.tree_map(lambda x: jax.device_put(x, sharding), tree)
