"""XLA-native combined non-maximum suppression.

TPU replacement for `tf.image.combined_non_max_suppression` (invoked by the
reference at ssdseglib/layers.py:141-149).  TF's kernel is a host/CUDA loop
with dynamic shapes; this version is fully static-shape jnp so it jits into
the same program as the model forward pass.

Default ("exact") formulation — iterative argmax, exact over ALL N anchors:

1. per class: `max_boxes_per_class` rounds of [argmax score over every
   not-yet-suppressed candidate above the score threshold (strict >), then
   suppress all candidates with IoU > iou_threshold against the selection].
   This is greedy NMS restated: the highest-scoring unsuppressed candidate
   is always the next greedy pick, so M tiny rounds of O(N) vector work
   replace a scan over all candidates — no top-K prefilter, no O(K^2) IoU
   matrix, exact for any score distribution at any anchor count.
2. across classes: class-major concatenation, stable top-`max_total` by
   score (mirrors TF's concat-then-top_k combine step, including tie order).

An alternative top-K-prefilter formulation (`lax.top_k` to
`max_candidates_per_class` candidates + a K-step suppression scan, with a
Pallas TPU kernel for the scan) is kept for workloads where
`max_boxes_per_class` is large enough that M sequential argmax rounds lose
to one K-step scan; it is exact only while <= K candidates clear the score
threshold.  Select it with ``method="topk"``.

IoU here uses the plain (no +1) convention with corner canonicalization,
matching TF NMS — the reference pipeline is +1 everywhere *except* inside
the TF NMS kernel, and we preserve that asymmetry for metric parity.
"""

from __future__ import annotations

from typing import Dict

import jax
import jax.numpy as jnp
import numpy as np

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
    """Pallas TPU lowering for the greedy scan on TPU backends only; the XLA
    fori_loop elsewhere (CPU tests, GPU — Mosaic TPU kernels do not lower on
    other accelerators)."""
    try:
        return jax.default_backend() == "tpu"
    except Exception:
        return False


def _exact_greedy_nms(
    boxes_yx: jnp.ndarray,
    scores_cn: jnp.ndarray,
    iou_threshold: float,
    score_threshold: float,
    max_keep: int,
):
    """Iterative-argmax greedy NMS, exact over all N candidates.

    Args:
        boxes_yx: (B, N, 4) corners shared across classes
        scores_cn: (B, C, N) per-class scores
    Returns:
        sel_idx: (B, C, M) selected candidate indices (class-local rounds)
        sel_scores: (B, C, M) selected scores, -inf where no selection
    """
    N = scores_cn.shape[-1]
    ymin = jnp.minimum(boxes_yx[..., 0], boxes_yx[..., 2])  # (B, N)
    xmin = jnp.minimum(boxes_yx[..., 1], boxes_yx[..., 3])
    ymax = jnp.maximum(boxes_yx[..., 0], boxes_yx[..., 2])
    xmax = jnp.maximum(boxes_yx[..., 1], boxes_yx[..., 3])
    area = (ymax - ymin) * (xmax - xmin)  # (B, N)

    avail0 = scores_cn > score_threshold  # (B, C, N)

    def gather_bc(values_bn: jnp.ndarray, idx_bc: jnp.ndarray) -> jnp.ndarray:
        # (B, N) gathered at (B, C) -> (B, C)
        return jnp.take_along_axis(
            values_bn[:, None, :], idx_bc[..., None], axis=-1
        )[..., 0]

    def step(avail, _):
        masked = jnp.where(avail, scores_cn, -jnp.inf)
        idx = jnp.argmax(masked, axis=-1)  # (B, C), first index on ties
        sel_score = jnp.take_along_axis(masked, idx[..., None], axis=-1)[..., 0]
        found = jnp.isfinite(sel_score)  # any candidate left this round?

        sy0 = gather_bc(ymin, idx)
        sx0 = gather_bc(xmin, idx)
        sy1 = gather_bc(ymax, idx)
        sx1 = gather_bc(xmax, idx)
        sarea = gather_bc(area, idx)
        inter_h = jnp.maximum(
            0.0,
            jnp.minimum(sy1[..., None], ymax[:, None, :])
            - jnp.maximum(sy0[..., None], ymin[:, None, :]),
        )
        inter_w = jnp.maximum(
            0.0,
            jnp.minimum(sx1[..., None], xmax[:, None, :])
            - jnp.maximum(sx0[..., None], xmin[:, None, :]),
        )
        inter = inter_h * inter_w  # (B, C, N)
        union = sarea[..., None] + area[:, None, :] - inter
        iou = jnp.where(union > 0.0, inter / union, 0.0)

        removed = (iou > iou_threshold) | (
            jnp.arange(N)[None, None, :] == idx[..., None]
        )
        new_avail = avail & ~(found[..., None] & removed)
        return new_avail, (idx, sel_score)

    _, (sel_idx, sel_scores) = jax.lax.scan(
        step, avail0, None, length=max_keep
    )
    # scan stacks on the leading axis: (M, B, C) -> (B, C, M)
    return (
        jnp.moveaxis(sel_idx, 0, -1),
        jnp.moveaxis(sel_scores, 0, -1),
    )


def combined_nms(
    boxes_yx: jnp.ndarray,
    scores: jnp.ndarray,
    cfg: NmsConfig,
    use_pallas: bool = None,
    method: str = "exact",
    iou_threshold=None,
    score_threshold=None,
) -> Dict[str, jnp.ndarray]:
    """Combined per-class NMS with shared boxes.

    Args:
        boxes_yx: (B, N, 4) decoded corners in (ymin, xmin, ymax, xmax) order
            (shared across classes, like the reference's expand_dims(axis=2)
            call at layers.py:142)
        scores: (B, N, C) per-class probabilities (class 0 = background is
            NOT special-cased here — the reference runs NMS over all classes
            and filters afterwards, layers.py:151-152)
        method: "exact" (default, iterative argmax over all N candidates) or
            "topk" (top-K prefilter + suppression scan; `use_pallas` selects
            the Pallas TPU kernel for the scan, default by backend)
        iou_threshold / score_threshold: optional overrides of the config
            values.  May be TRACED jnp scalars — the NMS math is
            elementwise in both, so one compiled program serves every
            operating point (the reference rebuilds + re-runs the whole
            Keras graph per grid point, notebook 03 cell 21).  A traced
            iou_threshold forces the XLA scan in the "topk" method (the
            Pallas kernel wants a static threshold).
    Returns:
        dict with
            boxes: (B, T, 4) kept boxes, (ymin, xmin, ymax, xmax), zero padded
            scores: (B, T) kept scores, zero padded
            classes: (B, T) float class ids, zero padded
            valid: (B,) number of valid rows per sample
        where T = cfg.max_boxes_per_sample.
    """
    B, N, C = scores.shape
    T = cfg.max_boxes_per_sample
    if iou_threshold is None:
        iou_threshold = cfg.iou_threshold
    if score_threshold is None:
        score_threshold = cfg.score_threshold
    scores_cn = jnp.swapaxes(scores, 1, 2)  # (B, C, N)

    if method == "exact":
        M = cfg.max_boxes_per_class
        sel_idx, sel_scores = _exact_greedy_nms(
            boxes_yx,
            scores_cn,
            iou_threshold,
            score_threshold,
            M,
        )
        flat_scores = sel_scores.reshape(B, C * M)
        flat_boxes = jnp.take_along_axis(
            boxes_yx[:, None, :, :], sel_idx[..., None], axis=2
        ).reshape(B, C * M, 4)
        flat_classes = jnp.broadcast_to(
            jnp.arange(C, dtype=jnp.float32)[None, :, None], (B, C, M)
        ).reshape(B, C * M)
    elif method == "topk":
        K = min(cfg.max_candidates_per_class, N)
        # per-class top-K candidates, sorted descending (ties -> lower index)
        cand_scores, cand_idx = jax.lax.top_k(scores_cn, K)  # (B, C, K)
        cand_boxes = jnp.take_along_axis(
            boxes_yx[:, None, :, :], cand_idx[..., None], axis=2
        )  # (B, C, K, 4)
        cand_valid = cand_scores > score_threshold

        iou = _pairwise_iou_yx(cand_boxes)  # (B, C, K, K)
        if use_pallas is None:
            use_pallas = _use_pallas_default()
        if use_pallas and not isinstance(
            iou_threshold, (int, float, np.floating, np.integer)
        ):
            # concrete (non-tracer) device scalars are static too
            use_pallas = isinstance(iou_threshold, jax.Array) and not isinstance(
                iou_threshold, jax.core.Tracer
            )
        if use_pallas:
            from ssdseglib_tpu.ops.nms_pallas import greedy_select_pallas

            keep = greedy_select_pallas(
                iou, cand_valid, float(iou_threshold), cfg.max_boxes_per_class
            )
        else:
            keep = _greedy_select(
                iou, cand_valid, iou_threshold, cfg.max_boxes_per_class
            )

        # combine across classes: class-major flatten, stable top-T by score
        flat_scores = jnp.where(keep, cand_scores, -jnp.inf).reshape(B, C * K)
        flat_boxes = cand_boxes.reshape(B, C * K, 4)
        flat_classes = jnp.broadcast_to(
            jnp.arange(C, dtype=jnp.float32)[None, :, None], (B, C, K)
        ).reshape(B, C * K)
    else:
        raise ValueError(f"unknown NMS method {method!r}")

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
