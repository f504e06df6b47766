"""Ground-truth encoding / offset decoding as fixed-shape jnp ops.

TPU-native counterpart of the reference per-sample host encoder
(reference ssdseglib/datacoder.py:177-300) and its decoders
(datacoder.py:349-432).  The reference builds a ragged TF graph per sample
(variable number of ground-truth boxes, `UniqueV2` dedup, dynamic scatter);
that shape-dynamism is hostile to XLA, so here the ground truth is padded to
a fixed ``max_ground_truth_boxes`` budget with a validity mask and the whole
encoder is branch-free vectorized math — `vmap` over the batch, jit once.

Matching semantics reproduced exactly (reference datacoder.py:222-298):

- step 1: every ground-truth box claims its best-IoU anchor (kept if IoU > 0)
- step 2: every anchor claims its best-IoU ground truth (kept if
  IoU > iou_threshold)
- conflicts: the reference concatenates [gt-claims; anchor-claims] and
  applies a sequential scatter, so for an anchor claimed by both, the
  anchor-side claim wins (applied last); among multiple gt-claims on one
  anchor the highest gt index wins.  We reproduce that deterministically
  with a scatter-max over gt indexes followed by an anchor-side override.

The non-standard offset transform ``log(w_gt / w_anchor + 1)`` (reference
datacoder.py:268-269) is kept for checkpoint parity, as is the +1
pixel-index convention in every area/width computation.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp

from ssdseglib_tpu.boxes import (
    Anchors,
    coordinates_centroids_to_corners,
    coordinates_corners_to_centroids,
)
from ssdseglib_tpu.config import EncodingConfig


def iou_matrix(
    anchors_corners: jnp.ndarray, gt_corners: jnp.ndarray
) -> jnp.ndarray:
    """IoU between every anchor and every ground-truth box.

    Args:
        anchors_corners: (N, 4) as (xmin, ymin, xmax, ymax)
        gt_corners: (G, 4) same layout
    Returns:
        (N, G) IoU with the +1 pixel-index convention
        (reference datacoder.py:206-220).
    """
    ax0, ay0, ax1, ay1 = jnp.split(anchors_corners, 4, axis=-1)  # (N, 1)
    gx0, gy0, gx1, gy1 = (gt_corners[:, i][None, :] for i in range(4))  # (1, G)

    inter_w = jnp.maximum(0.0, jnp.minimum(ax1, gx1) - jnp.maximum(ax0, gx0) + 1.0)
    inter_h = jnp.maximum(0.0, jnp.minimum(ay1, gy1) - jnp.maximum(ay0, gy0) + 1.0)
    inter = inter_w * inter_h

    area_a = (ax1 - ax0 + 1.0) * (ay1 - ay0 + 1.0)
    area_g = (gx1 - gx0 + 1.0) * (gy1 - gy0 + 1.0)
    return inter / (area_a + area_g - inter)


def match_anchors(
    iou: jnp.ndarray,
    gt_valid: jnp.ndarray,
    iou_threshold: float,
) -> jnp.ndarray:
    """Anchor-to-ground-truth assignment.

    Args:
        iou: (N, G) IoU matrix
        gt_valid: (G,) bool validity of each padded ground-truth slot
        iou_threshold: anchor-side match threshold (strict >)
    Returns:
        (N,) int32 assigned gt index per anchor, -1 for background.
    """
    neg = jnp.where(gt_valid[None, :], iou, -1.0)  # mask padded gt slots

    # gt-side claims: each valid gt with max IoU > 0 claims its argmax anchor;
    # highest gt index wins on collision (matches reference sequential scatter
    # order, datacoder.py:230-231 + 286-298).
    # Formulated as a masked reduction over the tiny G axis instead of a
    # scatter: TPU lowers small dynamic scatters poorly (measured 0.8 ms per
    # fused train step at B=16 — examples/08_profile.py round 3).
    best_anchor_per_gt = jnp.argmax(iou, axis=0)  # (G,)  ties -> lowest anchor
    gt_claim_valid = gt_valid & (jnp.max(neg, axis=0) > 0.0)
    gt_idx = jnp.arange(iou.shape[1], dtype=jnp.int32)
    n_idx = jnp.arange(iou.shape[0], dtype=jnp.int32)
    claims = best_anchor_per_gt[:, None] == n_idx[None, :]  # (G, N)
    assigned = jnp.max(
        jnp.where(
            claims & gt_claim_valid[:, None], gt_idx[:, None], -1
        ),
        axis=0,
    ).astype(jnp.int32)

    # anchor-side claims override (applied last in the reference scatter,
    # datacoder.py:236-244)
    best_gt_per_anchor = jnp.argmax(neg, axis=1).astype(jnp.int32)  # (N,)
    anchor_claim_valid = jnp.max(neg, axis=1) > iou_threshold
    return jnp.where(anchor_claim_valid, best_gt_per_anchor, assigned)


def encode_sample(
    gt_labels: jnp.ndarray,
    gt_boxes_corners: jnp.ndarray,
    gt_valid: jnp.ndarray,
    anchors_corners: jnp.ndarray,
    *,
    num_classes: int,
    iou_threshold: float,
    standard_deviations: Tuple[float, float, float, float],
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Encode one sample's ground truth into SSD training targets.

    Args:
        gt_labels: (G,) int class labels (0 reserved for background)
        gt_boxes_corners: (G, 4) corners (xmin, ymin, xmax, ymax)
        gt_valid: (G,) bool mask for padded slots
        anchors_corners: (N, 4) anchor corners
    Returns:
        labels: (N, num_classes) one-hot (background = class 0)
        offsets: (N, 4) standardized centroid offsets, zero for background
    """
    std_cx, std_cy, std_w, std_h = standard_deviations

    iou = iou_matrix(anchors_corners, gt_boxes_corners)
    assigned = match_anchors(iou, gt_valid, iou_threshold)
    matched = assigned >= 0
    safe = jnp.maximum(assigned, 0)

    # Row selection from the tiny (G, .) ground-truth tables via a one-hot
    # matmul instead of dynamic gathers: TPU gathers at (N,) indices cost
    # ~2 ms per fused train step at B=16, the selection matmul is MXU noise
    # (examples/08_profile.py round 3).  Exact ONLY at HIGHEST precision:
    # the TPU default lowers f32 matmuls through bf16 passes, which would
    # round the selected coordinates (~2 px at x=640); with full-f32
    # passes the products are x*1/x*0 and the sum has one nonzero term —
    # bit-exact selection.
    sel = jax.nn.one_hot(safe, gt_labels.shape[0], dtype=jnp.float32)  # (N, G)

    def select_rows(table):  # (G, K) -> (N, K), == table[safe]
        return jax.lax.dot(sel, table, precision=jax.lax.Precision.HIGHEST)

    # one-hot labels; unmatched anchors get background (class 0)
    gt_labels_oh = jax.nn.one_hot(gt_labels, num_classes, dtype=jnp.float32)
    labels_matched = select_rows(gt_labels_oh)  # == one_hot(gt_labels[safe])
    background = jax.nn.one_hot(
        jnp.zeros((), dtype=jnp.int32), num_classes, dtype=jnp.float32
    )
    labels = jnp.where(matched[:, None], labels_matched, background[None, :])

    # standardized centroid offsets (reference datacoder.py:251-269 incl. the
    # non-standard log(w_gt / w_anchor + 1) transform)
    acx, acy, aw, ah = coordinates_corners_to_centroids(
        anchors_corners[:, 0],
        anchors_corners[:, 1],
        anchors_corners[:, 2],
        anchors_corners[:, 3],
    )
    g = select_rows(gt_boxes_corners)  # (N, 4) == gt_boxes_corners[safe]
    gcx, gcy, gw, gh = coordinates_corners_to_centroids(
        g[:, 0], g[:, 1], g[:, 2], g[:, 3]
    )
    off = jnp.stack(
        [
            (gcx - acx) / aw / std_cx,
            (gcy - acy) / ah / std_cy,
            jnp.log(gw / aw + 1.0) / std_w,
            jnp.log(gh / ah + 1.0) / std_h,
        ],
        axis=-1,
    )
    offsets = jnp.where(matched[:, None], off, 0.0)
    return labels, offsets


def make_batch_encoder(anchors: Anchors, cfg: EncodingConfig):
    """Build a jitted batched encoder closed over the anchor constants.

    Returns a function (gt_labels (B, G), gt_boxes (B, G, 4), gt_valid (B, G))
    -> (labels (B, N, C), offsets (B, N, 4)).
    """
    anchors_corners = jnp.asarray(anchors.corners)
    single = functools.partial(
        encode_sample,
        num_classes=cfg.num_classes,
        iou_threshold=cfg.iou_threshold,
        standard_deviations=cfg.standard_deviations,
    )

    @jax.jit
    def encode_batch(gt_labels, gt_boxes_corners, gt_valid):
        return jax.vmap(lambda l, b, v: single(l, b, v, anchors_corners))(
            gt_labels.astype(jnp.int32),
            gt_boxes_corners.astype(jnp.float32),
            gt_valid.astype(bool),
        )

    return encode_batch


# ---------------------------------------------------------------------------
# offset decoding
# ---------------------------------------------------------------------------

def decode_offsets_to_centroids(
    offsets: jnp.ndarray,
    anchors_centroids: jnp.ndarray,
    standard_deviations: Tuple[float, float, float, float],
    zero_background: bool = True,
) -> jnp.ndarray:
    """Decode standardized centroid offsets back to centroid coordinates.

    Inverse of the encoder transform (reference datacoder.py:349-388):
    ``c = off * std * anchor_size + anchor_center`` and
    ``size = (exp(off * std) - 1) * anchor_size``.

    Args:
        offsets: (..., N, 4) standardized offsets
        anchors_centroids: (N, 4) as (cx, cy, w, h)
        zero_background: if True, rows whose offsets are all zero (the
            encoder's background marker) decode to all-zero coordinates
            (reference datacoder.py:377-382)
    Returns:
        (..., N, 4) centroids (cx, cy, w, h)
    """
    std = jnp.asarray(standard_deviations, dtype=offsets.dtype)
    acx, acy, aw, ah = (anchors_centroids[:, i] for i in range(4))
    o = offsets * std
    cx = o[..., 0] * aw + acx
    cy = o[..., 1] * ah + acy
    w = (jnp.exp(o[..., 2]) - 1.0) * aw
    h = (jnp.exp(o[..., 3]) - 1.0) * ah
    out = jnp.stack([cx, cy, w, h], axis=-1)
    if zero_background:
        not_background = (
            jnp.sum(jnp.abs(offsets), axis=-1, keepdims=True) > 0.0
        ).astype(out.dtype)
        out = out * not_background
    return out


def decode_offsets_to_corners(
    offsets: jnp.ndarray,
    anchors_centroids: jnp.ndarray,
    standard_deviations: Tuple[float, float, float, float],
    zero_background: bool = True,
) -> jnp.ndarray:
    """Decode standardized centroid offsets to corners (xmin, ymin, xmax, ymax).

    Mirrors reference datacoder.py:390-432 (background rows zeroed after the
    centroid->corner conversion, using the decoded-centroid magnitude test).
    """
    cent = decode_offsets_to_centroids(
        offsets, anchors_centroids, standard_deviations, zero_background=zero_background
    )
    xmin, ymin, xmax, ymax = coordinates_centroids_to_corners(
        cent[..., 0], cent[..., 1], cent[..., 2], cent[..., 3]
    )
    out = jnp.stack([xmin, ymin, xmax, ymax], axis=-1)
    if zero_background:
        not_background = (
            jnp.sum(jnp.abs(cent), axis=-1, keepdims=True) > 0.0
        ).astype(out.dtype)
        out = out * not_background
    return out


def decode_predictions_to_corners_yx(
    offsets: jnp.ndarray,
    anchors_centroids: jnp.ndarray,
    standard_deviations: Tuple[float, float, float, float],
) -> jnp.ndarray:
    """Decode *network-predicted* offsets to (ymin, xmin, ymax, xmax) corners.

    The inference-path decode layer (reference ssdseglib/layers.py:45-81):
    no background zeroing, output in the (y, x) order the NMS stage consumes.
    """
    cent = decode_offsets_to_centroids(
        offsets, anchors_centroids, standard_deviations, zero_background=False
    )
    xmin, ymin, xmax, ymax = coordinates_centroids_to_corners(
        cent[..., 0], cent[..., 1], cent[..., 2], cent[..., 3]
    )
    return jnp.stack([ymin, xmin, ymax, xmax], axis=-1)
