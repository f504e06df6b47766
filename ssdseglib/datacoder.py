"""TF-bridge datacoder: the reference `tf.data` recipe over the JAX encoder.

The reference notebooks build their input pipelines with
`tf.data.Dataset.map(data_reader_encoder.read_and_encode)` and
`.map(ssdseglib.datacoder.augmentation_rgb_channels)` (reference notebook
03 cell 8; reference datacoder.py:302-347, :434-466).  The TPU framework's
encoder is host-NumPy + jitted JAX (`ssdseglib_tpu.datacoder`); this module
wraps it behind `tf.numpy_function` so the notebook pipelines run verbatim,
while non-TF callers get the underlying implementation unchanged.

The bridged callables pin their JAX work to the CPU backend when one is
available: `Dataset.map` executes them on tf.data worker threads, and the
per-sample encode shouldn't ride the (single-client, high-RTT) TPU relay.
"""

from __future__ import annotations

import os

import numpy as np

import ssdseglib_tpu.datacoder as _impl

globals().update(
    {k: v for k, v in vars(_impl).items() if not k.startswith("__")}
)

#: Packed wire format for the tf.data bridge (default ON — disable with
#: SSDSEGLIB_PACKED_PIPELINE=0 for the bit-exact float32 reference wire):
#: `read_and_encode` emits uint8 images / uint8 class-map masks / uint8
#: label indices instead of float32 one-hot (16x less mask bandwidth
#: through tf.data AND the host->device link), and
#: `augmentation_rgb_channels` defers the color jitter to the device — the
#: TPU-native placement (the native pipeline runs flip/color/one-hot/match
#: inside the jitted step, data/pipeline.py) — by tagging the batch with a
#: per-batch seed the compat `fit` consumes.  The unpacked tensors are
#: reconstructed bit-exactly on device (exact {0,1} one-hot, reference
#: datacoder.py:247-248, :333); only the color jitter's RNG stream differs
#: from the host TF path (same distribution, jax PRNG).
COLOR_AUG_SEED_KEY = "__ssdseglib-color-aug-seed__"


def _packed_pipeline() -> bool:
    return os.environ.get("SSDSEGLIB_PACKED_PIPELINE", "1") != "0"


def _cpu_scope():
    """Context manager pinning JAX dispatch to CPU (no-op if unavailable)."""
    import contextlib

    import jax

    try:
        cpu = jax.local_devices(backend="cpu")[0]
    except RuntimeError:
        return contextlib.nullcontext()
    return jax.default_device(cpu)


def _is_tf_tensor(x) -> bool:
    import sys

    tf = sys.modules.get("tensorflow")
    return tf is not None and tf.is_tensor(x)


def _as_path(x) -> str:
    if isinstance(x, bytes):
        return x.decode()
    return str(x)


class DataEncoderDecoder(_impl.DataEncoderDecoder):
    """Reference `DataEncoderDecoder` surface (reference datacoder.py:5-432)
    whose `read_and_encode` also works inside `tf.data.Dataset.map`."""

    def read_and_encode(self, path_file_image, path_file_mask, path_file_labels_boxes):
        if not _is_tf_tensor(path_file_image):
            return super().read_and_encode(
                path_file_image, path_file_mask, path_file_labels_boxes
            )

        import tensorflow as tf

        h, w = self.image_height, self.image_width
        n = self.anchors.total_boxes

        if _packed_pipeline():
            # packed wire: u8 image / u8 class-map mask / u8 label indices
            # (one-hot reconstructed bit-exactly ON DEVICE by the compat
            # `fit` jitted step — ssdseglib/models.py)
            def _host_packed(pi, pm, pl):
                with _cpu_scope():
                    image, mask, labels, boxes = (
                        _impl.DataEncoderDecoder.read_and_encode_packed(
                            self, _as_path(pi), _as_path(pm), _as_path(pl)
                        )
                    )
                return (
                    np.ascontiguousarray(image),
                    np.ascontiguousarray(mask),
                    labels,
                    np.asarray(boxes, np.float32),
                )

            image, mask, labels, boxes = tf.numpy_function(
                _host_packed,
                [path_file_image, path_file_mask, path_file_labels_boxes],
                [tf.uint8, tf.uint8, tf.uint8, tf.float32],
            )
            image.set_shape((h, w, 3))
            mask.set_shape((h, w))
            labels.set_shape((n,))
            boxes.set_shape((n, 4))
            return image, {
                "output-mask": mask,
                "output-labels": labels,
                "output-boxes": boxes,
            }

        def _host(pi, pm, pl):
            with _cpu_scope():
                image, targets = _impl.DataEncoderDecoder.read_and_encode(
                    self, _as_path(pi), _as_path(pm), _as_path(pl)
                )
            return (
                np.asarray(image, np.float32),
                np.asarray(targets["output-mask"], np.float32),
                np.asarray(targets["output-labels"], np.float32),
                np.asarray(targets["output-boxes"], np.float32),
            )

        image, mask, labels, boxes = tf.numpy_function(
            _host,
            [path_file_image, path_file_mask, path_file_labels_boxes],
            [tf.float32, tf.float32, tf.float32, tf.float32],
        )
        image.set_shape((h, w, 3))
        mask.set_shape((h, w, self.num_classes))
        labels.set_shape((n, self.num_classes))
        boxes.set_shape((n, 4))
        return image, {
            "output-mask": mask,
            "output-labels": labels,
            "output-boxes": boxes,
        }


def augmentation_rgb_channels(image_batch, targets_batch):
    """Batch color augmentation usable in `Dataset.map` (reference
    datacoder.py:434-466; notebook 03 cell 8).

    On a packed-pipeline batch (uint8 images from the packed
    `read_and_encode`) the jitter is DEFERRED to the device: the batch is
    passed through untouched with a fresh per-batch seed in the targets
    dict (`COLOR_AUG_SEED_KEY`), and the compat `fit`/`evaluate` apply the
    same `ops/color.py` jitter inside the jitted step — images then cross
    the host->device link as uint8 (4x less traffic) and the 4-pass
    elementwise chain runs on the TPU instead of the 1-core host."""
    if not _is_tf_tensor(image_batch):
        return _impl.augmentation_rgb_channels(image_batch, targets_batch)

    import tensorflow as tf

    # deferral is strictly a packed-wire contract: gate on the SAME knob
    # as read_and_encode so SSDSEGLIB_PACKED_PIPELINE=0 restores the
    # host-computed jitter even for pipelines whose images are natively
    # uint8 (the tag is only meaningful to the facade's fit/evaluate)
    if (
        _packed_pipeline()
        and image_batch.dtype == tf.uint8
        and isinstance(targets_batch, dict)
    ):
        seed = tf.random.uniform(
            (), minval=0, maxval=2**31 - 1, dtype=tf.int32
        )
        return image_batch, {**targets_batch, COLOR_AUG_SEED_KEY: seed}

    def _host(images):
        import jax

        key = jax.random.key(int(np.random.default_rng().integers(2**31)))
        with _cpu_scope():
            from ssdseglib_tpu.ops import color as color_ops

            # f32 cast: a uint8 batch reaching the host fallback (packed
            # images with non-dict targets) must not run the HSV round
            # trip in integer arithmetic
            out = color_ops.augmentation_rgb_channels(
                key, np.asarray(images, np.float32)
            )
        return np.asarray(out, np.float32)

    augmented = tf.numpy_function(_host, [image_batch], tf.float32)
    augmented.set_shape(image_batch.shape)
    return augmented, targets_batch


def read_image(path_file_image):
    """Read an RGB PNG to float32, usable in `Dataset.map` (reference
    datacoder.py:468-484; notebook 03 cell 8 ds_test)."""
    if not _is_tf_tensor(path_file_image):
        return _impl.read_image(path_file_image)

    import tensorflow as tf

    def _host(p):
        return np.asarray(_impl.read_image(_as_path(p)), np.float32)

    image = tf.numpy_function(_host, [path_file_image], tf.float32)
    image.set_shape((None, None, 3))
    return image


