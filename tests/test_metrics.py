"""Golden-parity tests for streaming metrics vs the reference."""

import numpy as np
import pytest

from ssdseglib_tpu import metrics as tpu_metrics
from tests.test_losses import WEIGHTS, _random_box_targets, _random_masks


@pytest.mark.parametrize("seed", [0, 1])
def test_mask_iou_metric_parity(reference, seed):
    rng = np.random.default_rng(seed)
    y_true, y_pred = _random_masks(rng)
    ours = np.asarray(
        tpu_metrics.jaccard_iou_segmentation_masks(list(WEIGHTS))(y_true, y_pred)
    )
    theirs = reference.metrics.jaccard_iou_segmentation_masks(list(WEIGHTS))(
        y_true, y_pred
    ).numpy()
    np.testing.assert_allclose(ours, theirs, rtol=1e-4, atol=1e-5)


@pytest.mark.parametrize("seed", [0, 1])
def test_box_iou_metric_parity(reference, warehouse_anchors, seed):
    rng = np.random.default_rng(seed)
    n = warehouse_anchors.total_boxes
    labels, offsets, pred_offsets, _ = _random_box_targets(
        rng, batch=2, n_boxes=n, pos_frac=0.02
    )
    stds = (0.1, 0.1, 0.2, 0.2)
    ours_fn = tpu_metrics.jaccard_iou_bounding_boxes(warehouse_anchors, stds)
    theirs_fn = reference.metrics.jaccard_iou_bounding_boxes(
        center_x_boxes_default=warehouse_anchors.center_x,
        center_y_boxes_default=warehouse_anchors.center_y,
        width_boxes_default=warehouse_anchors.width,
        height_boxes_default=warehouse_anchors.height,
        standard_deviations_centroids_offsets=stds,
    )
    # scale down predicted offsets so decoded boxes stay sane-ish
    ours = np.asarray(ours_fn(offsets, pred_offsets * 0.3))
    theirs = theirs_fn(offsets, pred_offsets * 0.3).numpy()
    np.testing.assert_allclose(ours, theirs, rtol=1e-3, atol=1e-4)


@pytest.mark.parametrize("seed", [0, 1])
def test_categorical_accuracy_parity(reference, seed):
    rng = np.random.default_rng(seed)
    labels, _, _, probs = _random_box_targets(rng)
    weights = (0.0, 1 / 3, 1 / 3, 1 / 3)
    ours = np.asarray(
        tpu_metrics.categorical_accuracy(list(weights))(labels, probs)
    )
    theirs = reference.metrics.categorical_accuracy(list(weights))(
        labels, probs
    ).numpy()
    np.testing.assert_allclose(ours, theirs, rtol=1e-5, atol=1e-6)
