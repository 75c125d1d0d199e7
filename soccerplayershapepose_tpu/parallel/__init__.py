"""Device mesh / sharding layer (the reference has no distributed execution
at all — SURVEY.md §2.13; this layer is designed TPU-first from scratch)."""

from soccerplayershapepose_tpu.parallel.mesh import (  # noqa: F401
    make_mesh, shard_batch, replicate, data_sharding, MeshAxes)
from soccerplayershapepose_tpu.parallel.distributed import (  # noqa: F401
    initialize, local_batch_slice)
