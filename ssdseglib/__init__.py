"""`ssdseglib` — notebook-compatibility surface of the TPU-native framework.

Drop-in importable replacement for the reference package
(reference ssdseglib/__init__.py:1-9): the three tutorial notebooks'
`import ssdseglib` plus the Keras-style `compile`/`fit`/`predict`/`save`
recipe (reference notebook 03 cells 12-31) run unmodified against the
JAX/XLA backend in `ssdseglib_tpu`.

What lives here is only the *adapter* layer (SURVEY.md §7 "thin adapter
shims"): every implementation is in `ssdseglib_tpu.*`.  The adapters do
three jobs:

- module aliases with the reference names (`blocks`, `boxes`, `datacoder`,
  `models`, `layers`, `losses`, `metrics`, `evaluators`, `plot`)
- a TF bridge so the reference notebooks' `tf.data` pipelines can call
  `DataEncoderDecoder.read_and_encode` / `augmentation_rgb_channels` /
  `read_image` inside `Dataset.map` (reference notebook 03 cell 8)
- a Keras-style model facade (`models.KerasStyleModel`) returned by the
  builders' `get_model_for_training`, plus a `tf.keras.models.load_model`
  shim so checkpoints saved by `model.save(... .keras)` load back
  (reference notebook 03 cells 17/19)
"""

from ssdseglib import blocks
from ssdseglib import boxes
from ssdseglib import datacoder
from ssdseglib import evaluators
from ssdseglib import layers
from ssdseglib import losses
from ssdseglib import metrics
from ssdseglib import models
from ssdseglib import plot

# If TensorFlow is already imported (the notebooks import it before
# `import ssdseglib` — reference notebook 03 cell 2), install the
# `tf.keras.models.load_model` shim so cell 19 can load `.keras` files
# written by this backend's `model.save`.  Files not written by this
# backend fall through to the original Keras loader untouched.
models.install_tf_load_model_shim()

__all__ = [
    "blocks",
    "boxes",
    "datacoder",
    "evaluators",
    "layers",
    "losses",
    "metrics",
    "models",
    "plot",
]
