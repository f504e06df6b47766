"""Streaming train-time metrics — jnp counterparts of reference metrics.py.

Same per-sample contract as the losses: ``(batch,)`` values the train loop
averages.  Reference quirks preserved:

- the mask IoU is *soft* — computed on probabilities, no argmax
  (reference metrics.py:21-48)
- the box-IoU metric clamps decoded width/height at 0 because a training
  network can emit invalid boxes (reference metrics.py:103-109)
- "categorical accuracy" counts elementwise one-hot agreement per class —
  zeros agreeing with zeros count too (reference metrics.py:205-216)
"""

from __future__ import annotations

from typing import Callable, Sequence, Tuple

import jax.numpy as jnp

from ssdseglib_tpu.boxes import Anchors

_EPSILON = 1e-7


def jaccard_iou_segmentation_masks(classes_weights: Sequence[float]) -> Callable:
    """Weighted soft mask IoU factory (reference metrics.py:5-50)."""
    weights = jnp.asarray(classes_weights, dtype=jnp.float32)

    def metric(y_true: jnp.ndarray, y_pred: jnp.ndarray) -> jnp.ndarray:
        intersection = jnp.sum(y_true * y_pred, axis=(1, 2))
        total = jnp.sum(y_true + y_pred, axis=(1, 2))
        iou = intersection / (total - intersection + _EPSILON)
        return jnp.sum(iou * weights, axis=-1)

    return metric


def jaccard_iou_bounding_boxes(
    anchors: Anchors,
    standard_deviations: Tuple[float, float, float, float],
) -> Callable:
    """Decoded-box IoU metric factory (reference metrics.py:53-173).

    Decodes both ground truth and predictions from standardized offsets with
    the ``max(0, size)`` clamp, zeroes background rows, and averages IoU over
    the positive anchors of each sample.
    """
    std_cx, std_cy, std_w, std_h = standard_deviations
    acx = jnp.asarray(anchors.center_x)
    acy = jnp.asarray(anchors.center_y)
    aw = jnp.asarray(anchors.width)
    ah = jnp.asarray(anchors.height)

    def _decode(offsets: jnp.ndarray, not_background: jnp.ndarray):
        cx = (offsets[..., 0] * std_cx * aw + acx) * not_background
        cy = (offsets[..., 1] * std_cy * ah + acy) * not_background
        w = jnp.maximum(0.0, (jnp.exp(offsets[..., 2] * std_w) - 1.0) * aw)
        h = jnp.maximum(0.0, (jnp.exp(offsets[..., 3] * std_h) - 1.0) * ah)
        w = w * not_background
        h = h * not_background
        xmin = (cx - (w - 1.0) / 2.0) * not_background
        ymin = (cy - (h - 1.0) / 2.0) * not_background
        xmax = (cx + (w - 1.0) / 2.0) * not_background
        ymax = (cy + (h - 1.0) / 2.0) * not_background
        return xmin, ymin, xmax, ymax, w, h

    def metric(y_true: jnp.ndarray, y_pred: jnp.ndarray) -> jnp.ndarray:
        not_background = (jnp.sum(jnp.abs(y_true), axis=-1) > 0.0).astype(
            y_pred.dtype
        )
        px0, py0, px1, py1, pw, ph = _decode(y_pred, not_background)
        tx0, ty0, tx1, ty1, tw, th = _decode(y_true, not_background)

        iw = jnp.maximum(
            0.0, jnp.minimum(px1, tx1) - jnp.maximum(px0, tx0) + 1.0
        ) * not_background
        ih = jnp.maximum(
            0.0, jnp.minimum(py1, ty1) - jnp.maximum(py0, ty0) + 1.0
        ) * not_background

        area_t = tw * th
        area_p = pw * ph
        inter = iw * ih
        iou = inter / (area_p + area_t - inter + _EPSILON)
        return jnp.sum(iou, axis=-1) / jnp.sum(not_background, axis=-1)

    return metric


def categorical_accuracy(classes_weights: Sequence[float]) -> Callable:
    """Weighted elementwise one-hot agreement factory (metrics.py:176-220)."""
    weights = jnp.asarray(classes_weights, dtype=jnp.float32)

    def metric(y_true: jnp.ndarray, y_pred: jnp.ndarray) -> jnp.ndarray:
        # match tf.one_hot(argmax): exactly one hot per row (first max wins)
        num_classes = y_pred.shape[-1]
        idx = jnp.argmax(y_pred, axis=-1)
        pred_one_hot = (
            jnp.arange(num_classes) == idx[..., None]
        ).astype(y_pred.dtype)
        agree = (pred_one_hot == y_true).astype(y_pred.dtype)
        agree = jnp.sum(agree, axis=1)  # (B, C)
        n_boxes = y_true.shape[1]
        return jnp.sum(agree / n_boxes * weights, axis=-1)

    return metric
