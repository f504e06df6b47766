"""Pallas greedy-NMS kernel parity vs the XLA scan (interpreter mode on CPU)."""

import numpy as np
import pytest

import jax.numpy as jnp

from ssdseglib_tpu.ops.nms import _greedy_select, _pairwise_iou_yx
from ssdseglib_tpu.ops.nms_pallas import greedy_select_pallas


def _random_case(rng, B=4, C=4, K=64):
    cx = rng.uniform(0, 200, (B, C, K))
    cy = rng.uniform(0, 200, (B, C, K))
    w = rng.uniform(5, 60, (B, C, K))
    h = rng.uniform(5, 60, (B, C, K))
    boxes = np.stack(
        [cy - h / 2, cx - w / 2, cy + h / 2, cx + w / 2], -1
    ).astype(np.float32)
    scores = np.sort(rng.uniform(0, 1, (B, C, K)).astype(np.float32))[
        ..., ::-1
    ].copy()
    return boxes, scores


@pytest.mark.parametrize("seed", [0, 1, 2])
@pytest.mark.parametrize("iou_thr,max_keep", [(0.4, 4), (0.025, 10), (0.9, 2)])
def test_pallas_scan_matches_xla(seed, iou_thr, max_keep):
    rng = np.random.default_rng(seed)
    boxes, scores = _random_case(rng)
    valid = jnp.asarray(scores > 0.3)
    iou = _pairwise_iou_yx(jnp.asarray(boxes))

    xla = np.asarray(_greedy_select(iou, valid, iou_thr, max_keep))
    pallas = np.asarray(
        greedy_select_pallas(iou, valid, iou_thr, max_keep, interpret=True)
    )
    np.testing.assert_array_equal(pallas, xla)


def test_pallas_scan_unaligned_k():
    """K not a multiple of 128 exercises the lane padding path."""
    rng = np.random.default_rng(3)
    boxes, scores = _random_case(rng, B=2, C=2, K=100)
    valid = jnp.asarray(scores > 0.2)
    iou = _pairwise_iou_yx(jnp.asarray(boxes))
    xla = np.asarray(_greedy_select(iou, valid, 0.5, 4))
    pallas = np.asarray(greedy_select_pallas(iou, valid, 0.5, 4, interpret=True))
    np.testing.assert_array_equal(pallas, xla)
