"""Training losses — jnp counterparts of reference ssdseglib/losses.py.

All functions keep the reference's per-sample reduction contract: given
``y_true``/``y_pred`` of a batch they return one scalar loss per batch item,
shape ``(batch,)``; the train step averages over the batch and applies the
per-output loss weights (the Keras `compile(loss_weights=...)` contract,
reference notebook 03 cell 14).

Reference quirks preserved on purpose (SURVEY.md §7):
- hard-negative mining selects top-k background losses **globally over the
  flattened batch**, not per sample (reference losses.py:113-156)
- the confidence/cross-entropy losses consume *probabilities* (the model
  emits softmax), re-log-ed with an epsilon clip — not logits
- localization loss normalizes by per-sample positive count, no batch-size
  multiply despite the reference docstring claiming one (losses.py:11)
"""

from __future__ import annotations

from typing import Callable, Optional, Sequence

import jax.numpy as jnp

_EPSILON = 1e-7  # tf.keras.backend.epsilon()


def localization_loss(y_true: jnp.ndarray, y_pred: jnp.ndarray) -> jnp.ndarray:
    """Smooth-L1 over the 4 offsets of positive (non-background) anchors.

    Reference: ssdseglib/losses.py:5-49.  Background anchors are identified
    by their all-zero encoded offsets.

    Args:
        y_true: (B, N, 4) encoded ground-truth offsets
        y_pred: (B, N, 4) predicted offsets
    Returns:
        (B,) per-sample loss.
    """
    not_background = (jnp.sum(jnp.abs(y_true), axis=-1) > 0.0).astype(y_pred.dtype)

    abs_err = jnp.abs(y_true - y_pred)
    sq_err = jnp.square(y_true - y_pred)
    smooth_l1 = jnp.where(abs_err < 1.0, sq_err * 0.5, abs_err - 0.5)
    per_box = jnp.sum(smooth_l1, axis=-1) * not_background

    num_pos = jnp.sum(not_background, axis=-1)
    return jnp.sum(per_box, axis=-1) / jnp.maximum(num_pos, 1.0)


def confidence_loss(
    y_true: jnp.ndarray,
    y_pred: jnp.ndarray,
    negatives_ratio: Optional[float] = 3.0,
) -> jnp.ndarray:
    """Softmax CE with batch-global hard-negative mining.

    Reference: ssdseglib/losses.py:52-172.  The top-k selection over
    background losses runs on the flattened (B*N,) tensor with
    ``k = min(3 * total_positives, total_negatives)`` — a *global* budget.
    ``k`` is data-dependent, which TF handles with a dynamic-shape top_k;
    here we instead rank all background losses once (stable descending sort,
    ties broken by lower flat index exactly like tf.math.top_k) and keep
    entries with rank < k — same selection, fully static shapes, and the
    ``background_samples == 0`` corner collapses to k == 0 with no branch
    (the reference needs a python-level `if` at losses.py:119 for it).

    Args:
        y_true: (B, N, C) one-hot labels (class 0 = background)
        y_pred: (B, N, C) predicted probabilities
        negatives_ratio: hard-negative budget as a multiple of the positive
            count.  The default 3.0 is the reference's exact behavior.
            ``None`` is a framework EXTENSION: every background anchor
            contributes (plain CE normalized by positives) — with the
            reference's ReLU6-capped class logits this continuously drives
            confidently-wrong background anchors down through the (still
            trainable) background logit instead of waiting for them to
            enter the top-k budget, which stabilizes detection score
            ordering (docs/PERFORMANCE.md round-2 learning study).
    Returns:
        (B,) per-sample loss.
    """
    is_background = y_true[:, :, 0]
    not_background = jnp.abs(is_background - 1.0)

    log_pred = jnp.log(jnp.clip(y_pred, _EPSILON, 1.0 - _EPSILON))
    ce = -jnp.sum(y_true * log_pred, axis=-1)  # (B, N)

    pos_loss = jnp.sum(ce * not_background, axis=-1)  # (B,)
    num_pos_per_sample = jnp.sum(not_background, axis=-1)

    if negatives_ratio is None:
        neg_loss = jnp.sum(ce * is_background, axis=-1)  # (B,)
        return (pos_loss + neg_loss) / jnp.maximum(num_pos_per_sample, 1.0)

    # global hard-negative budget
    total_pos = jnp.sum(not_background).astype(jnp.int32)
    total_bg = jnp.sum(is_background).astype(jnp.int32)
    k = jnp.minimum(
        (negatives_ratio * total_pos).astype(jnp.int32), total_bg
    )

    bg_loss_flat = (ce * is_background).reshape(-1)
    order = jnp.argsort(-bg_loss_flat, stable=True)
    rank = jnp.zeros_like(order).at[order].set(jnp.arange(order.shape[0]))
    keep = (rank < k).astype(ce.dtype).reshape(ce.shape)

    neg_loss = jnp.sum(ce * is_background * keep, axis=-1)  # (B,)

    return (pos_loss + neg_loss) / jnp.maximum(num_pos_per_sample, 1.0)


def dice(classes_weights: Sequence[float]) -> Callable:
    """Weighted Dice loss factory (reference losses.py:175-218)."""
    weights = jnp.asarray(classes_weights, dtype=jnp.float32)

    def dice_loss(y_true: jnp.ndarray, y_pred: jnp.ndarray) -> jnp.ndarray:
        intersection = jnp.sum(y_true * y_pred, axis=(1, 2))
        total = jnp.sum(y_true + y_pred, axis=(1, 2))
        loss = 1.0 - (2.0 * intersection + _EPSILON) / (total + _EPSILON)
        return jnp.sum(loss * weights, axis=-1)

    return dice_loss


def dice_square(classes_weights: Sequence[float]) -> Callable:
    """Weighted squared-denominator Dice loss factory (losses.py:221-264)."""
    weights = jnp.asarray(classes_weights, dtype=jnp.float32)

    def dice_square_loss(y_true: jnp.ndarray, y_pred: jnp.ndarray) -> jnp.ndarray:
        intersection = jnp.sum(y_true * y_pred, axis=(1, 2))
        total_sq = jnp.sum(jnp.square(y_true) + jnp.square(y_pred), axis=(1, 2))
        loss = 1.0 - (2.0 * intersection + _EPSILON) / (total_sq + _EPSILON)
        return jnp.sum(loss * weights, axis=-1)

    return dice_square_loss


def cross_entropy(classes_weights: Sequence[float]) -> Callable:
    """Weighted CE-over-probabilities factory (losses.py:267-307).

    Note the reference sums CE over the full (H, W) plane per class (no
    pixel-count normalization) before the weighted class sum — preserved.
    """
    weights = jnp.asarray(classes_weights, dtype=jnp.float32)

    def cross_entropy_loss(y_true: jnp.ndarray, y_pred: jnp.ndarray) -> jnp.ndarray:
        log_pred = jnp.log(jnp.clip(y_pred, _EPSILON, 1.0 - _EPSILON))
        loss = -jnp.sum(y_true * log_pred, axis=(1, 2))  # (B, C)
        return jnp.sum(loss * weights, axis=-1)

    return cross_entropy_loss
