"""Spatial (H-axis) model parallelism — the CNN analogue of sequence
parallelism, on top of the existing batch (data) parallelism.

Why: batch sharding cannot help single-image latency or memory for very
large inputs — with batch 1 a data-parallel mesh leaves N-1 chips idle.
Sharding the image HEIGHT across mesh devices partitions every conv,
BN, resize and elementwise op spatially; XLA GSPMD inserts the halo
exchanges (one row of boundary pixels per 3x3 conv, riding ICI) and
turns the global reductions (BN batch stats in train mode, ASPP global
pooling, batch-global segmentation suppression, loss sums) into psums.
No hand-written collective anywhere — exactly the design of the
data-parallel path (parallel/mesh.py), extended to a second mesh axis.

The reference has no multi-device story at all (SURVEY.md §2 parallelism
checklist: absent); this is net-new TPU-native capability.

Usage:
    mesh = spatial.make_hybrid_mesh(n_data=2, n_spatial=4)   # 8 chips
    model = builder.get_model_for_inference(mesh=mesh, ...)  # images are
    # sharded (batch over 'data', H over 'spatial') automatically; the
    # Trainer's fit/mesh path shards train images the same way.

Pure-spatial latency serving: make_hybrid_mesh(1, n_chips) with batch 1.

Correctness is asserted on the 8-virtual-device CPU mesh
(tests/test_spatial_parallel.py): forward and one optimizer step match
the single-device results; halo-dependent ops (3x3/5x5 convs, stride-2,
dilated ASPP branches, bilinear resizes) are all in the tested graph.
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ssdseglib_tpu.parallel.mesh import BATCH_AXIS

SPATIAL_AXIS = "spatial"


def make_hybrid_mesh(
    n_data: int,
    n_spatial: int,
    devices: Optional[Sequence[jax.Device]] = None,
) -> Mesh:
    """2-D ('data', 'spatial') mesh: batch sharded over `n_data` device
    groups, image height sharded `n_spatial`-way inside each group.
    `n_data=1` gives pure spatial parallelism (single-image latency);
    `n_spatial=1` degenerates to the plain data-parallel mesh."""
    if devices is None:
        devices = jax.devices()
    if n_data * n_spatial > len(devices):
        raise ValueError(
            f"mesh {n_data}x{n_spatial} needs {n_data * n_spatial} devices, "
            f"have {len(devices)}"
        )
    grid = np.asarray(devices[: n_data * n_spatial]).reshape(
        n_data, n_spatial
    )
    return Mesh(grid, (BATCH_AXIS, SPATIAL_AXIS))


def has_spatial_axis(mesh: Mesh) -> bool:
    return SPATIAL_AXIS in mesh.axis_names


def image_sharding(mesh: Mesh) -> NamedSharding:
    """Sharding for (B, H, W, C) image batches: batch over 'data', height
    over 'spatial' when the mesh has one (plain batch sharding otherwise)."""
    if has_spatial_axis(mesh):
        return NamedSharding(mesh, P(BATCH_AXIS, SPATIAL_AXIS))
    return NamedSharding(mesh, P(BATCH_AXIS))


def shard_images(mesh: Mesh, images):
    """Device-put an image batch with `image_sharding`, with clear
    divisibility errors (batch %% data axis, height %% spatial axis)."""
    n_data = mesh.shape[BATCH_AXIS]
    if images.ndim < 2 or images.shape[0] % n_data != 0:
        raise ValueError(
            f"batch axis of shape {getattr(images, 'shape', ())} is not "
            f"divisible by the {n_data}-device mesh '{BATCH_AXIS}' axis; "
            f"pad the batch or use a divisible batch size"
        )
    if has_spatial_axis(mesh):
        n_sp = mesh.shape[SPATIAL_AXIS]
        if images.shape[1] % n_sp != 0:
            raise ValueError(
                f"height axis of shape {images.shape} is not divisible by "
                f"the {n_sp}-device mesh '{SPATIAL_AXIS}' axis"
            )
    return jax.device_put(images, image_sharding(mesh))
