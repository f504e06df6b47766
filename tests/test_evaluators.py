"""Golden-parity tests for the post-hoc evaluators vs the reference."""

import numpy as np
import pytest

from ssdseglib_tpu import evaluators as tpu_eval


def _write_gt_csvs(tmp_path, samples):
    paths = []
    for i, (labels, boxes) in enumerate(samples):
        p = tmp_path / f"gt{i}.csv"
        rows = [
            f"{int(l)},{b[0]:.1f},{b[1]:.1f},{b[2]:.1f},{b[3]:.1f}"
            for l, b in zip(labels, boxes)
        ]
        p.write_text("\r\n".join(rows))
        paths.append(str(p))
    return paths


def _random_eval_case(rng, n_samples=6, k=10):
    """Random predictions + ground truth in the post-NMS output format."""
    gts = []
    for _ in range(n_samples):
        g = int(rng.integers(0, 5))
        labels = rng.integers(1, 4, size=g)
        x0 = rng.uniform(0, 500, g)
        y0 = rng.uniform(0, 380, g)
        boxes = np.stack(
            [x0, y0, x0 + rng.uniform(10, 120, g), y0 + rng.uniform(10, 90, g)], 1
        ).round(1)
        gts.append((labels, boxes))

    labels_pred = rng.integers(0, 4, size=(n_samples, k)).astype(np.int32)
    conf_pred = rng.uniform(0.2, 1.0, size=(n_samples, k)).astype(np.float32)
    # predictions: half near a gt box, half random
    boxes_pred = rng.uniform(0, 500, size=(n_samples, k, 4)).astype(np.float32)
    boxes_pred[..., 2] = boxes_pred[..., 0] + rng.uniform(10, 120, (n_samples, k))
    boxes_pred[..., 3] = boxes_pred[..., 1] + rng.uniform(10, 90, (n_samples, k))
    for i, (gl, gb) in enumerate(gts):
        for j in range(min(len(gl), k // 2)):
            jitter = rng.uniform(-8, 8, 4)
            boxes_pred[i, j] = gb[j] + jitter
            labels_pred[i, j] = gl[j] if rng.uniform() < 0.8 else rng.integers(1, 4)
    return gts, labels_pred, conf_pred, boxes_pred


@pytest.mark.parametrize("seed", [0, 1, 2])
@pytest.mark.parametrize("iou_threshold", [0.5, 0.7])
def test_map_parity(reference, tmp_path, seed, iou_threshold):
    rng = np.random.default_rng(seed)
    gts, labels_pred, conf_pred, boxes_pred = _random_eval_case(rng)
    paths = _write_gt_csvs(tmp_path, gts)

    ours = tpu_eval.average_precision_object_detection(
        labels_pred_batch=labels_pred,
        confidences_pred_batch=conf_pred,
        boxes_pred_batch=boxes_pred,
        iou_threshold=iou_threshold,
        path_files_labels_boxes=paths,
        labels_codes=[0, 1, 2, 3],
        label_code_background=0,
    )
    theirs = reference.evaluators.average_precision_object_detection(
        labels_pred_batch=labels_pred,
        confidences_pred_batch=conf_pred,
        boxes_pred_batch=boxes_pred,
        iou_threshold=iou_threshold,
        path_files_labels_boxes=paths,
        labels_codes=[0, 1, 2, 3],
        label_code_background=0,
    )
    assert set(ours) == set(theirs)
    for label in theirs:
        np.testing.assert_allclose(
            ours[label], theirs[label], rtol=1e-5, atol=1e-6, err_msg=str(label)
        )


def test_map_accepts_array_ground_truth(tmp_path):
    """Our evaluator also takes (labels, boxes) tuples directly — no CSV."""
    rng = np.random.default_rng(0)
    gts, labels_pred, conf_pred, boxes_pred = _random_eval_case(rng)
    paths = _write_gt_csvs(tmp_path, gts)
    from_paths = tpu_eval.average_precision_object_detection(
        labels_pred, conf_pred, boxes_pred, 0.5, paths, [0, 1, 2, 3], 0
    )
    from_arrays = tpu_eval.average_precision_object_detection(
        labels_pred, conf_pred, boxes_pred, 0.5, gts, [0, 1, 2, 3], 0
    )
    for label in from_paths:
        np.testing.assert_allclose(from_paths[label], from_arrays[label], rtol=1e-6)


@pytest.mark.parametrize("seed", [0, 1])
def test_miou_parity(reference, tmp_path, seed):
    from PIL import Image

    rng = np.random.default_rng(seed)
    n, h, w, c = 4, 24, 32, 4
    class_maps = rng.integers(0, c, size=(n, h, w)).astype(np.uint8)
    paths = []
    for i in range(n):
        p = tmp_path / f"mask{i}.png"
        Image.fromarray(class_maps[i], mode="L").save(p)
        paths.append(str(p))

    logits = rng.normal(size=(n, h, w, c)).astype(np.float32)
    pred = np.exp(logits) / np.exp(logits).sum(-1, keepdims=True)

    ours = tpu_eval.jaccard_iou_semantic_segmentation(
        pred, paths, [0, 1, 2, 3], 0
    )
    theirs = reference.evaluators.jaccard_iou_semantic_segmentation(
        pred, paths, [0, 1, 2, 3], 0
    )
    assert set(ours) == set(theirs)
    for label in theirs:
        np.testing.assert_allclose(ours[label], float(theirs[label]), rtol=1e-5)
