"""Device parallelism: mesh construction + sharding helpers.

The reference is strictly single-process/single-device (SURVEY.md §2
parallelism checklist: all absent).  Scaling here is new TPU-native
capability: `jax.sharding.Mesh` + NamedSharding data parallelism over ICI,
with XLA inserting the gradient psum — no NCCL/MPI layer to port.
"""

from ssdseglib_tpu.parallel.mesh import (
    BATCH_AXIS,
    make_mesh,
    replicate_sharding,
    batch_sharding,
    shard_batch,
    shard_images,
    replicate,
)
from ssdseglib_tpu.parallel.spatial import (
    SPATIAL_AXIS,
    make_hybrid_mesh,
    image_sharding,
)

__all__ = [
    "BATCH_AXIS",
    "SPATIAL_AXIS",
    "make_mesh",
    "make_hybrid_mesh",
    "replicate_sharding",
    "batch_sharding",
    "image_sharding",
    "shard_batch",
    "shard_images",
    "replicate",
]
