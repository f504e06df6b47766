"""Golden-parity tests for ground-truth encoding/decoding vs the reference.

The reference encoder (datacoder.py:177-300) is ragged + host-side; ours is
fixed-shape vectorized.  These tests drive both on identical inputs —
including matching-conflict edge cases — and demand identical outputs.
"""

import numpy as np
import pytest

from ssdseglib_tpu.boxes import Anchors
from ssdseglib_tpu.config import AnchorsConfig
from ssdseglib_tpu.datacoder import DataEncoderDecoder

IMAGE_SHAPE = (96, 128)

SMALL_ANCHORS_CFG = AnchorsConfig(
    feature_maps_shapes=((6, 8), (3, 4)),
    feature_maps_aspect_ratios=((1.0, 2.0, 0.5),) * 2,
    boxes_scales=(0.2, 0.9),
    centers_padding_from_borders=(0.05, 0.05),
    additional_square_box=True,
)


@pytest.fixture(scope="module")
def small_anchors():
    return Anchors.from_config(SMALL_ANCHORS_CFG, IMAGE_SHAPE)


@pytest.fixture(scope="module")
def ref_coder(reference, small_anchors):
    return _reference_coder(reference, small_anchors)


@pytest.fixture(scope="module")
def our_coder(small_anchors):
    return _our_coder(small_anchors)


def _reference_coder(reference, anchors, **kw):
    kwargs = dict(
        num_classes=4,
        image_shape=IMAGE_SHAPE,
        xmin_boxes_default=anchors.xmin,
        ymin_boxes_default=anchors.ymin,
        xmax_boxes_default=anchors.xmax,
        ymax_boxes_default=anchors.ymax,
        iou_threshold=0.5,
        standard_deviations_centroids_offsets=(0.1, 0.1, 0.2, 0.2),
    )
    kwargs.update(kw)
    return reference.datacoder.DataEncoderDecoder(**kwargs)


def _our_coder(anchors, **kw):
    kwargs = dict(
        num_classes=4,
        image_shape=IMAGE_SHAPE,
        xmin_boxes_default=anchors.xmin,
        ymin_boxes_default=anchors.ymin,
        xmax_boxes_default=anchors.xmax,
        ymax_boxes_default=anchors.ymax,
        iou_threshold=0.5,
        standard_deviations_centroids_offsets=(0.1, 0.1, 0.2, 0.2),
    )
    kwargs.update(kw)
    return DataEncoderDecoder(**kwargs)


def _write_csv(tmp_path, labels, boxes, name="gt.csv"):
    """Ground-truth CSV with CRLF endings, like the dataset's files
    (the reference splits on '\\r\\n', datacoder.py:195)."""
    path = tmp_path / name
    rows = [
        f"{int(l)},{b[0]:.3f},{b[1]:.3f},{b[2]:.3f},{b[3]:.3f}"
        for l, b in zip(labels, boxes)
    ]
    path.write_bytes(("\r\n".join(rows)).encode())
    return str(path)


def _random_gt(rng, n, image_shape=IMAGE_SHAPE):
    h, w = image_shape
    labels = rng.integers(1, 4, size=n)
    x0 = rng.uniform(0, w * 0.8, n)
    y0 = rng.uniform(0, h * 0.8, n)
    x1 = x0 + rng.uniform(2, w * 0.5, n)
    y1 = y0 + rng.uniform(2, h * 0.5, n)
    boxes = np.stack([x0, y0, np.minimum(x1, w - 1), np.minimum(y1, h - 1)], 1)
    # round to the CSV serialization precision so the reference (reading the
    # CSV) and our encoder (fed arrays) see bit-identical coordinates
    return labels, np.round(boxes, 3)


@pytest.mark.parametrize("seed", [0, 1, 2, 3, 4, 5, 6, 7])
@pytest.mark.parametrize("flip", [False, True])
def test_encode_parity_random(ref_coder, our_coder, tmp_path, seed, flip):
    rng = np.random.default_rng(seed)
    n = int(rng.integers(1, 9))
    labels, boxes = _random_gt(rng, n)
    csv_path = _write_csv(tmp_path, labels, boxes, name=f"gt{seed}{flip}.csv")

    ref_labels, ref_offsets = ref_coder._encode_ground_truth_labels_boxes(
        path_file_labels_boxes=csv_path, augment_with_horizontal_flip=flip
    )

    our_labels, our_offsets = our_coder.encode_ground_truth(
        labels, boxes, flip_horizontal=flip
    )

    np.testing.assert_allclose(our_labels, ref_labels.numpy(), atol=1e-5)
    np.testing.assert_allclose(our_offsets, ref_offsets.numpy(), rtol=1e-3, atol=1e-3)


def test_encode_parity_conflicts(ref_coder, our_coder, small_anchors, tmp_path):
    """Two ground-truth boxes engineered to claim the same anchor: the
    reference resolves via scatter order (higher gt index wins among gt-side
    claims, anchor-side claim wins overall)."""
    # duplicate + nearly-duplicate boxes around one anchor
    a = np.asarray(small_anchors.corners[10])
    gt_boxes = np.stack([a, a + 0.5, a - 0.5], axis=0)
    gt_labels = np.array([1, 2, 3])
    csv_path = _write_csv(tmp_path, gt_labels, gt_boxes)

    ref_labels, ref_offsets = ref_coder._encode_ground_truth_labels_boxes(
        path_file_labels_boxes=csv_path, augment_with_horizontal_flip=False
    )
    our_labels, our_offsets = our_coder.encode_ground_truth(gt_labels, gt_boxes)

    np.testing.assert_allclose(our_labels, ref_labels.numpy(), atol=1e-5)
    np.testing.assert_allclose(our_offsets, ref_offsets.numpy(), rtol=1e-3, atol=1e-3)


def test_encode_no_match_gt(ref_coder, our_coder, tmp_path):
    """A degenerate far-away gt with zero IoU everywhere must be dropped."""
    labels = np.array([2])
    boxes = np.array([[-500.0, -500.0, -490.0, -490.0]])
    csv_path = _write_csv(tmp_path, labels, boxes)

    ref_labels, ref_offsets = ref_coder._encode_ground_truth_labels_boxes(
        path_file_labels_boxes=csv_path, augment_with_horizontal_flip=False
    )
    our_labels, our_offsets = our_coder.encode_ground_truth(labels, boxes)

    np.testing.assert_allclose(our_labels, ref_labels.numpy(), atol=1e-6)
    np.testing.assert_allclose(our_offsets, ref_offsets.numpy(), atol=1e-6)
    # everything background
    assert np.all(np.asarray(our_labels)[:, 0] == 1.0)


@pytest.mark.parametrize("seed", [0, 3])
def test_decode_parity(ref_coder, our_coder, tmp_path, seed):
    """decode_to_centroids / decode_to_corners invert the encoder like the
    reference's decoders (datacoder.py:349-432)."""
    rng = np.random.default_rng(seed)
    labels, boxes = _random_gt(rng, 5)
    csv_path = _write_csv(tmp_path, labels, boxes)

    _, ref_offsets = ref_coder._encode_ground_truth_labels_boxes(
        path_file_labels_boxes=csv_path, augment_with_horizontal_flip=False
    )
    ref_cent = ref_coder.decode_to_centroids(ref_offsets).numpy()
    ref_corn = ref_coder.decode_to_corners(ref_offsets).numpy()

    _, our_offsets = our_coder.encode_ground_truth(labels, boxes)
    our_cent = np.asarray(our_coder.decode_to_centroids(our_offsets))
    our_corn = np.asarray(our_coder.decode_to_corners(our_offsets))

    np.testing.assert_allclose(our_cent, ref_cent, rtol=1e-4, atol=1e-3)
    np.testing.assert_allclose(our_corn, ref_corn, rtol=1e-4, atol=1e-3)


def test_roundtrip_recovers_ground_truth(our_coder):
    """Matched anchors must decode back to the exact ground-truth corners."""
    rng = np.random.default_rng(7)
    labels, boxes = _random_gt(rng, 4)
    enc_labels, enc_offsets = our_coder.encode_ground_truth(labels, boxes)
    decoded = np.asarray(our_coder.decode_to_corners(enc_offsets))

    matched = np.asarray(enc_labels)[:, 0] == 0.0
    assert matched.sum() > 0
    # every matched anchor decodes to one of the gt boxes
    for corners in decoded[matched]:
        err = np.min(np.max(np.abs(boxes - corners), axis=1))
        assert err < 1e-2


def test_centroids_ctor_matches_corners_ctor(small_anchors):
    a = small_anchors
    ours_corners = _our_coder(a)
    ours_centroids = DataEncoderDecoder(
        num_classes=4,
        image_shape=IMAGE_SHAPE,
        center_x_boxes_default=a.center_x,
        center_y_boxes_default=a.center_y,
        width_boxes_default=a.width,
        height_boxes_default=a.height,
        iou_threshold=0.5,
    )
    np.testing.assert_allclose(
        ours_centroids.anchors.corners, ours_corners.anchors.corners, rtol=1e-5
    )
    with pytest.raises(ValueError):
        DataEncoderDecoder(num_classes=4, image_shape=IMAGE_SHAPE,
                           xmin_boxes_default=a.xmin)
