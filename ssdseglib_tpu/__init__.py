"""ssdseglib_tpu — a TPU-native (JAX/XLA/Pallas/pjit) multi-task framework.

A from-scratch rebuild of the capabilities of
`matteo-stat/multi-task-learning-object-detection-semantic-segmentation`
(reference mounted read-only at /root/reference; see SURVEY.md): joint object
detection (SSDLite) + semantic segmentation (DeepLabV3+) on MobileNetV2 /
ShuffleNetV2 backbones.

Design stance (not a port):
- functional core: pure jitted functions over pytrees, `vmap` over batch
- Flax linen modules for the networks (NHWC, MXU-friendly convs)
- anchors precomputed host-side as constants, encoding/decoding fully
  vectorized on device (fixed shapes, no ragged per-sample host loops)
- XLA-native combined NMS (no tf.image dependency)
- data parallelism via `jax.sharding.Mesh` + NamedSharding (no NCCL/MPI)

The public surface mirrors the reference package `ssdseglib`
(reference ssdseglib/__init__.py:1-9): blocks, boxes, datacoder, models,
layers, losses, metrics, evaluators, plot — so a reference user finds every
entry point under the same module names.
"""

from ssdseglib_tpu import boxes
from ssdseglib_tpu import config
from ssdseglib_tpu import datacoder
from ssdseglib_tpu import losses
from ssdseglib_tpu import metrics
from ssdseglib_tpu import evaluators
from ssdseglib_tpu import layers
from ssdseglib_tpu import blocks
from ssdseglib_tpu import models
from ssdseglib_tpu import ops
from ssdseglib_tpu import plot

# TPU-native additions beyond the reference surface (lazy-import heavy ones)
from ssdseglib_tpu import checkpoint
from ssdseglib_tpu import export
from ssdseglib_tpu import keras_import
from ssdseglib_tpu import parallel
from ssdseglib_tpu import train

__version__ = "0.1.0"

__all__ = [
    "boxes",
    "config",
    "datacoder",
    "losses",
    "metrics",
    "evaluators",
    "layers",
    "blocks",
    "models",
    "ops",
    "plot",
    "checkpoint",
    "export",
    "keras_import",
    "parallel",
    "train",
    "__version__",
]
