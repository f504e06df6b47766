"""XLA-native combined non-maximum suppression.

TPU replacement for `tf.image.combined_non_max_suppression` (invoked by the
reference at ssdseglib/layers.py:141-149).  TF's kernel is a host/CUDA loop
with dynamic shapes; this version is fully static-shape jnp so it jits into
the same program as the model forward pass:

1. per class: `lax.top_k` prefilter to K candidates (exact for any realistic
   score distribution; K is configurable), score threshold (strict >)
2. greedy suppression as a `lax.fori_loop` over the K sorted candidates with
   an O(K^2) IoU matrix — selected boxes suppress later candidates with
   IoU > iou_threshold; selection stops at `max_boxes_per_class`
3. across classes: class-major concatenation, stable top-`max_total` by score
   (mirrors TF's concat-then-top_k combine step, including tie order)

IoU here uses the plain (no +1) convention with corner canonicalization,
matching TF NMS — the reference pipeline is +1 everywhere *except* inside
the TF NMS kernel, and we preserve that asymmetry for metric parity.
"""

from __future__ import annotations

from typing import Dict

import jax
import jax.numpy as jnp

from ssdseglib_tpu.config import NmsConfig


def _pairwise_iou_yx(boxes: jnp.ndarray) -> jnp.ndarray:
    """Pairwise IoU of (..., K, 4) boxes in (ymin, xmin, ymax, xmax) layout.

    Corners are canonicalized (min/max swap) and areas use the plain
    continuous-coordinate convention, matching the TF NMS kernel.
    """
    ymin = jnp.minimum(boxes[..., 0], boxes[..., 2])
    xmin = jnp.minimum(boxes[..., 1], boxes[..., 3])
    ymax = jnp.maximum(boxes[..., 0], boxes[..., 2])
    xmax = jnp.maximum(boxes[..., 1], boxes[..., 3])

    inter_h = jnp.maximum(
        0.0,
        jnp.minimum(ymax[..., :, None], ymax[..., None, :])
        - jnp.maximum(ymin[..., :, None], ymin[..., None, :]),
    )
    inter_w = jnp.maximum(
        0.0,
        jnp.minimum(xmax[..., :, None], xmax[..., None, :])
        - jnp.maximum(xmin[..., :, None], xmin[..., None, :]),
    )
    inter = inter_h * inter_w
    area = (ymax - ymin) * (xmax - xmin)
    union = area[..., :, None] + area[..., None, :] - inter
    return jnp.where(union > 0.0, inter / union, 0.0)


def _greedy_select(
    iou: jnp.ndarray,
    candidate_valid: jnp.ndarray,
    iou_threshold: float,
    max_keep: int,
) -> jnp.ndarray:
    """Greedy NMS over score-sorted candidates.

    Args:
        iou: (..., K, K) pairwise IoU of candidates sorted by descending score
        candidate_valid: (..., K) bool, above score threshold
        max_keep: cap on selections per leading index
    Returns:
        (..., K) bool keep mask.
    """
    K = iou.shape[-1]
    batch_shape = candidate_valid.shape[:-1]

    def body(i, state):
        keep, suppressed, count = state
        take = candidate_valid[..., i] & ~suppressed[..., i] & (count < max_keep)
        keep = keep.at[..., i].set(take)
        count = count + take.astype(jnp.int32)
        # a selected box suppresses all later candidates overlapping too much
        later = jnp.arange(K) > i
        overlap = iou[..., i, :] > iou_threshold
        suppressed = suppressed | (take[..., None] & overlap & later)
        return keep, suppressed, count

    keep0 = jnp.zeros(batch_shape + (K,), dtype=bool)
    suppressed0 = jnp.zeros(batch_shape + (K,), dtype=bool)
    count0 = jnp.zeros(batch_shape, dtype=jnp.int32)
    keep, _, _ = jax.lax.fori_loop(0, K, body, (keep0, suppressed0, count0))
    return keep


def _use_pallas_default() -> bool:
    """Pallas TPU lowering for the greedy scan on TPU backends; the XLA
    fori_loop elsewhere (CPU tests, non-TPU platforms)."""
    try:
        return jax.default_backend() not in ("cpu",)
    except Exception:
        return False


def combined_nms(
    boxes_yx: jnp.ndarray,
    scores: jnp.ndarray,
    cfg: NmsConfig,
    use_pallas: bool = None,
) -> Dict[str, jnp.ndarray]:
    """Combined per-class NMS with shared boxes.

    Args:
        boxes_yx: (B, N, 4) decoded corners in (ymin, xmin, ymax, xmax) order
            (shared across classes, like the reference's expand_dims(axis=2)
            call at layers.py:142)
        scores: (B, N, C) per-class probabilities (class 0 = background is
            NOT special-cased here — the reference runs NMS over all classes
            and filters afterwards, layers.py:151-152)
    Returns:
        dict with
            boxes: (B, T, 4) kept boxes, (ymin, xmin, ymax, xmax), zero padded
            scores: (B, T) kept scores, zero padded
            classes: (B, T) float class ids, zero padded
            valid: (B,) number of valid rows per sample
        where T = cfg.max_boxes_per_sample.
    """
    B, N, C = scores.shape
    K = min(cfg.max_candidates_per_class, N)
    T = cfg.max_boxes_per_sample

    # per-class top-K candidates, sorted descending (ties -> lower index)
    scores_cn = jnp.swapaxes(scores, 1, 2)  # (B, C, N)
    cand_scores, cand_idx = jax.lax.top_k(scores_cn, K)  # (B, C, K)
    cand_boxes = jnp.take_along_axis(
        boxes_yx[:, None, :, :], cand_idx[..., None], axis=2
    )  # (B, C, K, 4)
    cand_valid = cand_scores > cfg.score_threshold

    iou = _pairwise_iou_yx(cand_boxes)  # (B, C, K, K)
    if use_pallas is None:
        use_pallas = _use_pallas_default()
    if use_pallas:
        from ssdseglib_tpu.ops.nms_pallas import greedy_select_pallas

        keep = greedy_select_pallas(
            iou, cand_valid, cfg.iou_threshold, cfg.max_boxes_per_class
        )
    else:
        keep = _greedy_select(
            iou, cand_valid, cfg.iou_threshold, cfg.max_boxes_per_class
        )

    # combine across classes: class-major flatten, stable top-T by score
    flat_scores = jnp.where(keep, cand_scores, -jnp.inf).reshape(B, C * K)
    flat_boxes = cand_boxes.reshape(B, C * K, 4)
    flat_classes = jnp.broadcast_to(
        jnp.arange(C, dtype=jnp.float32)[None, :, None], (B, C, K)
    ).reshape(B, C * K)

    order = jnp.argsort(-flat_scores, axis=-1, stable=True)[:, :T]  # (B, T)
    top_scores = jnp.take_along_axis(flat_scores, order, axis=-1)
    top_boxes = jnp.take_along_axis(flat_boxes, order[..., None], axis=1)
    top_classes = jnp.take_along_axis(flat_classes, order, axis=-1)

    valid_row = jnp.isfinite(top_scores)
    out_scores = jnp.where(valid_row, top_scores, 0.0)
    out_boxes = jnp.where(valid_row[..., None], top_boxes, 0.0)
    out_classes = jnp.where(valid_row, top_classes, 0.0)
    return {
        "boxes": out_boxes,
        "scores": out_scores,
        "classes": out_classes,
        "valid": jnp.sum(valid_row, axis=-1).astype(jnp.int32),
    }
