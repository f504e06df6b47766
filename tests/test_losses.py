"""Golden-parity tests for losses vs the reference TF implementations."""

import numpy as np
import pytest

from ssdseglib_tpu import losses as tpu_losses


def _random_box_targets(rng, batch=4, n_boxes=64, num_classes=4, pos_frac=0.2):
    """Random encoded detection targets + predictions."""
    is_pos = rng.uniform(size=(batch, n_boxes)) < pos_frac
    labels = np.zeros((batch, n_boxes, num_classes), np.float32)
    labels[..., 0] = 1.0
    pos_classes = rng.integers(1, num_classes, size=(batch, n_boxes))
    for b in range(batch):
        for i in range(n_boxes):
            if is_pos[b, i]:
                labels[b, i] = 0.0
                labels[b, i, pos_classes[b, i]] = 1.0
    offsets = np.where(
        is_pos[..., None],
        rng.normal(size=(batch, n_boxes, 4)).astype(np.float32),
        0.0,
    ).astype(np.float32)
    pred_offsets = rng.normal(size=(batch, n_boxes, 4)).astype(np.float32)
    logits = rng.normal(size=(batch, n_boxes, num_classes)).astype(np.float32)
    probs = np.exp(logits) / np.exp(logits).sum(-1, keepdims=True)
    return labels, offsets, pred_offsets, probs.astype(np.float32)


@pytest.mark.parametrize("seed", [0, 1, 2])
def test_localization_loss_parity(reference, seed):
    rng = np.random.default_rng(seed)
    labels, offsets, pred_offsets, _ = _random_box_targets(rng)
    ours = np.asarray(tpu_losses.localization_loss(offsets, pred_offsets))
    theirs = reference.losses.localization_loss(offsets, pred_offsets).numpy()
    np.testing.assert_allclose(ours, theirs, rtol=1e-5, atol=1e-5)


def test_localization_loss_all_background(reference):
    y_true = np.zeros((2, 16, 4), np.float32)
    y_pred = np.ones((2, 16, 4), np.float32)
    ours = np.asarray(tpu_losses.localization_loss(y_true, y_pred))
    theirs = reference.losses.localization_loss(y_true, y_pred).numpy()
    np.testing.assert_allclose(ours, theirs, rtol=1e-6)
    assert np.all(ours == 0.0)


@pytest.mark.parametrize("seed,pos_frac", [(0, 0.2), (1, 0.05), (2, 0.5), (3, 0.0)])
def test_confidence_loss_parity(reference, seed, pos_frac):
    """Includes pos_frac=0 (k=0 top-k corner the reference branches on)."""
    rng = np.random.default_rng(seed)
    labels, _, _, probs = _random_box_targets(rng, pos_frac=pos_frac)
    ours = np.asarray(tpu_losses.confidence_loss(labels, probs))
    theirs = reference.losses.confidence_loss(labels, probs).numpy()
    np.testing.assert_allclose(ours, theirs, rtol=1e-4, atol=1e-5)


def test_confidence_loss_all_negatives_extension():
    """negatives_ratio=None (framework extension): every background anchor
    contributes — equals plain CE normalized by per-sample positives; the
    default 3.0 path stays golden-pinned to the reference elsewhere."""
    rng = np.random.default_rng(5)
    labels, _, _, probs = _random_box_targets(rng, pos_frac=0.1)
    ours = np.asarray(
        tpu_losses.confidence_loss(labels, probs, negatives_ratio=None)
    )
    ce = -np.sum(labels * np.log(np.clip(probs, 1e-7, 1 - 1e-7)), axis=-1)
    num_pos = np.sum(1.0 - labels[..., 0], axis=-1)
    want = ce.sum(-1) / np.maximum(num_pos, 1.0)
    np.testing.assert_allclose(ours, want, rtol=1e-5, atol=1e-5)
    # all-negatives >= hard-negative-mined loss (supset of CE terms)
    mined = np.asarray(tpu_losses.confidence_loss(labels, probs))
    assert np.all(ours >= mined - 1e-6)
    # a larger explicit ratio also monotonically increases the loss
    r10 = np.asarray(
        tpu_losses.confidence_loss(labels, probs, negatives_ratio=10.0)
    )
    assert np.all(r10 >= mined - 1e-6) and np.all(ours >= r10 - 1e-6)


def test_confidence_loss_hard_negative_budget_is_global(reference):
    """Sample 0 has many positives, sample 1 none: the reference's global
    3:1 budget lets sample 1 contribute negatives funded by sample 0's
    positives — both implementations must agree on that behavior."""
    rng = np.random.default_rng(9)
    num_classes = 4
    labels = np.zeros((2, 32, num_classes), np.float32)
    labels[..., 0] = 1.0
    for i in range(16):  # sample 0: 16 positives
        labels[0, i] = 0.0
        labels[0, i, 1 + i % 3] = 1.0
    logits = rng.normal(size=(2, 32, num_classes)).astype(np.float32)
    probs = (np.exp(logits) / np.exp(logits).sum(-1, keepdims=True)).astype(
        np.float32
    )
    ours = np.asarray(tpu_losses.confidence_loss(labels, probs))
    theirs = reference.losses.confidence_loss(labels, probs).numpy()
    np.testing.assert_allclose(ours, theirs, rtol=1e-4, atol=1e-5)
    assert ours[1] > 0.0  # sample 1 got mined negatives despite 0 positives


def _random_masks(rng, batch=2, h=16, w=24, num_classes=4):
    class_map = rng.integers(0, num_classes, size=(batch, h, w))
    y_true = np.eye(num_classes, dtype=np.float32)[class_map]
    logits = rng.normal(size=(batch, h, w, num_classes)).astype(np.float32)
    y_pred = np.exp(logits) / np.exp(logits).sum(-1, keepdims=True)
    return y_true, y_pred.astype(np.float32)


WEIGHTS = (0.05, 0.575, 0.135, 0.24)


@pytest.mark.parametrize("factory", ["dice", "dice_square", "cross_entropy"])
@pytest.mark.parametrize("seed", [0, 1])
def test_segmentation_losses_parity(reference, factory, seed):
    rng = np.random.default_rng(seed)
    y_true, y_pred = _random_masks(rng)
    ours_fn = getattr(tpu_losses, factory)(list(WEIGHTS))
    theirs_fn = getattr(reference.losses, factory)(list(WEIGHTS))
    ours = np.asarray(ours_fn(y_true, y_pred))
    theirs = theirs_fn(y_true, y_pred).numpy()
    np.testing.assert_allclose(ours, theirs, rtol=1e-4, atol=1e-5)
