"""Mesh + sharding helpers (data parallelism over ICI).

Design (SURVEY.md §5, §7): the flagship model is a 4M-parameter CNN — the
right decomposition is batch sharding with replicated parameters.  Under
`jax.jit` with sharded batch inputs XLA SPMD:

- partitions the whole forward/backward over the batch axis
- turns batch-norm's batch reductions into cross-device psums (global-batch
  semantics, better than per-device BN)
- inserts the gradient all-reduce over ICI automatically

so there is no hand-written collective anywhere — the mesh + shardings are
the entire parallelism specification.
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

BATCH_AXIS = "data"


def make_mesh(devices: Optional[Sequence[jax.Device]] = None) -> Mesh:
    """1-D data-parallel mesh over the given (default: all) devices."""
    if devices is None:
        devices = jax.devices()
    return Mesh(np.asarray(devices), (BATCH_AXIS,))


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Shard the leading (batch) axis, replicate the rest."""
    return NamedSharding(mesh, P(BATCH_AXIS))


def replicate_sharding(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(mesh: Mesh, tree):
    """Device-put a pytree of batch-leading arrays with the batch axis
    sharded across the mesh.

    Raises a clear ValueError when the batch is not divisible by the mesh
    size (XLA's own error is an opaque sharding failure).
    """
    sharding = batch_sharding(mesh)
    n = mesh.shape[BATCH_AXIS]

    def put(x):
        if hasattr(x, "shape") and (x.ndim == 0 or x.shape[0] % n != 0):
            raise ValueError(
                f"batch axis of shape {getattr(x, 'shape', ())} is not "
                f"divisible by the {n}-device mesh '{BATCH_AXIS}' axis; "
                f"pad the batch or use a divisible batch size"
            )
        return jax.device_put(x, sharding)

    return jax.tree_util.tree_map(put, tree)


def replicate(mesh: Mesh, tree):
    """Device-put a pytree fully replicated across the mesh."""
    sharding = replicate_sharding(mesh)
    return jax.tree_util.tree_map(
        lambda x: jax.device_put(x, sharding), tree
    )


def shard_images(mesh: Mesh, images):
    """Device-put an image batch (B, H, W, C): batch over the data axis
    and, when the mesh has a 'spatial' axis (parallel/spatial.py), height
    over it — XLA GSPMD inserts the conv halo exchanges.  Identical to
    `shard_batch` on a plain 1-D data mesh."""
    from ssdseglib_tpu.parallel import spatial as spatial_lib

    return spatial_lib.shard_images(mesh, images)
