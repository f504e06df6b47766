"""Inference-path layers — functional counterparts of reference layers.py.

The reference wraps these as serializable Keras layers; here they are plain
callables over jnp arrays (jit-compatible, composable into the inference
forward function).  Construction arguments mirror the reference layer ctors
so configuration code translates one-to-one.
"""

from __future__ import annotations

from typing import List, Sequence, Union

import jax.numpy as jnp
import numpy as np

from ssdseglib_tpu.config import NmsConfig
from ssdseglib_tpu.ops import nms as nms_ops
from ssdseglib_tpu.ops.encoding import decode_predictions_to_corners_yx


class DecodeBoxesCentroidsOffsets:
    """Decode predicted centroid offsets to (ymin, xmin, ymax, xmax) corners.

    Reference: ssdseglib/layers.py:5-93.  Anchor constants are baked in at
    construction; the call is a pure jnp function of the predictions.
    """

    def __init__(
        self,
        center_x_boxes_default,
        center_y_boxes_default,
        width_boxes_default,
        height_boxes_default,
        standard_deviation_center_x_offsets: float,
        standard_deviation_center_y_offsets: float,
        standard_deviation_width_offsets: float,
        standard_deviation_height_offsets: float,
    ) -> None:
        self.anchors_centroids = jnp.stack(
            [
                jnp.asarray(center_x_boxes_default, dtype=jnp.float32),
                jnp.asarray(center_y_boxes_default, dtype=jnp.float32),
                jnp.asarray(width_boxes_default, dtype=jnp.float32),
                jnp.asarray(height_boxes_default, dtype=jnp.float32),
            ],
            axis=-1,
        )
        self.standard_deviations = (
            float(standard_deviation_center_x_offsets),
            float(standard_deviation_center_y_offsets),
            float(standard_deviation_width_offsets),
            float(standard_deviation_height_offsets),
        )

    def __call__(self, boxes_centroids_offsets: jnp.ndarray) -> jnp.ndarray:
        return decode_predictions_to_corners_yx(
            boxes_centroids_offsets, self.anchors_centroids, self.standard_deviations
        )


class NonMaximumSuppression:
    """Combined NMS + output formatting.

    Reference: ssdseglib/layers.py:96-177.  Output rows are
    ``[label, probability, xmin, ymin, xmax, ymax]`` with shape
    (batch, max_boxes_per_sample, 6), zero padded.

    ``suppress_background_boxes=True`` reproduces the reference's
    batch-flattening boolean mask (layers.py:165-166) — it is a host-side
    (non-jittable) post-step because the output becomes ragged.
    """

    def __init__(
        self,
        max_number_of_boxes_per_class: int,
        max_number_of_boxes_per_sample: int,
        boxes_iou_threshold: float,
        labels_probability_threshold: float,
        suppress_background_boxes: bool = False,
        max_candidates_per_class: int = 256,
    ) -> None:
        self.config = NmsConfig(
            max_boxes_per_class=max_number_of_boxes_per_class,
            max_boxes_per_sample=max_number_of_boxes_per_sample,
            iou_threshold=boxes_iou_threshold,
            score_threshold=labels_probability_threshold,
            suppress_background_boxes=suppress_background_boxes,
            max_candidates_per_class=max_candidates_per_class,
        )

    def __call__(
        self,
        boxes_corners_coordinates: jnp.ndarray,
        labels_probabilities: jnp.ndarray,
        iou_threshold=None,
        score_threshold=None,
    ) -> jnp.ndarray:
        """Args: boxes (B, N, 4) in (ymin, xmin, ymax, xmax); scores
        (B, N, C).  The optional threshold overrides may be traced jnp
        scalars (runtime-tunable NMS operating point — see
        ops/nms.combined_nms)."""
        out = nms_ops.combined_nms(
            boxes_corners_coordinates,
            labels_probabilities,
            self.config,
            iou_threshold=iou_threshold,
            score_threshold=score_threshold,
        )
        # reorder to (xmin, ymin, xmax, ymax) like the reference (layers.py:155)
        boxes_xy = out["boxes"][..., jnp.array([1, 0, 3, 2])]
        detections = jnp.concatenate(
            [out["classes"][..., None], out["scores"][..., None], boxes_xy], axis=-1
        )
        if self.config.suppress_background_boxes:
            # ragged host-side filter; loses the batch dimension (reference
            # quirk, layers.py:115 warns about it too)
            detections = np.asarray(detections)
            return detections[detections[..., 0] > 0.0]
        return detections


class SegmentationSuppression:
    """Cross-task gating of detection probabilities by the segmentation mask.

    Reference: ssdseglib/layers.py:180-212 including its two quirks, kept for
    metric parity: class presence is reduced over the **whole batch** (axis
    (0, 1, 2) — one sample's segmentation can enable a class for every other
    sample in the batch) and the one-hot depth defaults to 4.
    """

    def __init__(self, num_classes: int = 4) -> None:
        self.num_classes = num_classes

    def __call__(
        self, segmentation_mask: jnp.ndarray, labels_probabilities: jnp.ndarray
    ) -> jnp.ndarray:
        pred = jnp.argmax(segmentation_mask, axis=-1)
        one_hot = (
            jnp.arange(self.num_classes) == pred[..., None]
        ).astype(labels_probabilities.dtype)
        is_class_segmented = jnp.clip(jnp.sum(one_hot, axis=(0, 1, 2)), 0.0, 1.0)
        return labels_probabilities * is_class_segmented


class Split:
    """Channel/axis split (reference layers.py:215-244, minus its
    `get_config` attribute typo)."""

    def __init__(
        self, num_or_size_splits: Union[int, List[int]], axis: int, num: int = None
    ) -> None:
        self.num_or_size_splits = num_or_size_splits
        self.axis = axis
        self.num = num

    def __call__(self, value: jnp.ndarray) -> Sequence[jnp.ndarray]:
        if isinstance(self.num_or_size_splits, int):
            return jnp.split(value, self.num_or_size_splits, axis=self.axis)
        sizes = np.cumsum(self.num_or_size_splits)[:-1]
        return jnp.split(value, sizes, axis=self.axis)
