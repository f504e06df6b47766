"""Gradient-level golden parity: jax.grad of the full 3-loss training
objective vs tf.GradientTape on the reference Keras model (VERDICT r1 item
6 — training dynamics proven equivalent, not assumed).

Protocol: build the reference model (random init), import its weights into
the Flax model, forward BOTH in training mode (batch-stat BN) on the same
input, apply the compiled loss recipe of reference notebook 03 cell 14
(weighted CE mask loss + confidence loss + localization loss, unit loss
weights, Keras batch-mean reduction), and compare per-layer gradients.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from ssdseglib_tpu import losses as losses_lib
from ssdseglib_tpu.config import ModelConfig
from ssdseglib_tpu.keras_import import (
    build_layer_maps,
    export_keras_weights,
    import_keras_weights,
    weights_by_layer_from_keras_model,
)
from ssdseglib_tpu.models.builder import SsdSegModel

INPUT_SHAPE = (96, 128, 3)
# feature maps at 96x128: os16 6x8, os32 3x4, extra 2x2 and 1x1 (6 boxes/pt)
N_BOXES = (6 * 8 + 3 * 4 + 2 * 2 + 1 * 1) * 6
NUM_CLASSES = 4
MASK_WEIGHTS = [0.05, 0.575, 0.135, 0.24]  # reference nb 03 cell 14


@pytest.fixture(scope="module")
def reference_model(reference):
    rng = np.random.default_rng(0)
    builder = reference.models.MobileNetV2SsdSegBuilder(
        input_image_shape=INPUT_SHAPE,
        number_of_boxes_per_point=6,
        number_of_classes=NUM_CLASSES,
        center_x_boxes_default=rng.uniform(0, 128, N_BOXES).astype(np.float32),
        center_y_boxes_default=rng.uniform(0, 96, N_BOXES).astype(np.float32),
        width_boxes_default=rng.uniform(5, 40, N_BOXES).astype(np.float32),
        height_boxes_default=rng.uniform(5, 40, N_BOXES).astype(np.float32),
        standard_deviations_centroids_offsets=(0.1, 0.1, 0.2, 0.2),
    )
    return builder.get_model_for_training(
        segmentation_architecture="deeplabv3plus",
        object_detection_architecture="ssdlite",
        segmentation_dilation_rates=(3, 6, 12),
    )


def _synthetic_batch(batch=2, seed=11):
    """Random input + encoder-shaped targets with a handful of positives
    per sample (exercises the batch-global hard-negative mining path)."""
    rng = np.random.default_rng(seed)
    x = rng.uniform(0, 255, (batch,) + INPUT_SHAPE).astype(np.float32)

    h, w = INPUT_SHAPE[:2]
    mask_ids = rng.integers(0, NUM_CLASSES, (batch, h, w))
    mask_true = np.eye(NUM_CLASSES, dtype=np.float32)[mask_ids]

    labels_true = np.zeros((batch, N_BOXES, NUM_CLASSES), np.float32)
    labels_true[..., 0] = 1.0  # background everywhere
    boxes_true = np.zeros((batch, N_BOXES, 4), np.float32)
    for b in range(batch):
        pos = rng.choice(N_BOXES, size=13, replace=False)
        cls = rng.integers(1, NUM_CLASSES, size=13)
        labels_true[b, pos, 0] = 0.0
        labels_true[b, pos, cls] = 1.0
        boxes_true[b, pos] = rng.normal(0, 0.7, (13, 4)).astype(np.float32)
    return x, mask_true, labels_true, boxes_true


def _tf_grads(reference, model, x, mask_true, labels_true, boxes_true):
    import tensorflow as tf

    ce = reference.losses.cross_entropy(MASK_WEIGHTS)
    with tf.GradientTape() as tape:
        mask_pred, labels_pred, boxes_pred = model(x, training=True)
        loss = (
            tf.reduce_mean(ce(tf.constant(mask_true), mask_pred))
            + tf.reduce_mean(
                reference.losses.confidence_loss(
                    tf.constant(labels_true), labels_pred
                )
            )
            + tf.reduce_mean(
                reference.losses.localization_loss(
                    tf.constant(boxes_true), boxes_pred
                )
            )
        )
    grads = tape.gradient(loss, model.trainable_variables)
    by_ref = {id(v): g for v, g in zip(model.trainable_variables, grads)}
    by_layer = {}
    for layer in model.layers:
        tw = layer.trainable_weights
        if tw:
            by_layer[layer.name] = [
                np.asarray(by_ref[id(v)]) for v in tw
            ]
    return float(loss), by_layer


def _jax_grads(module, variables, x, mask_true, labels_true, boxes_true):
    mask_loss = losses_lib.cross_entropy(MASK_WEIGHTS)

    def loss_fn(params, batch_stats, images):
        outputs, _ = module.apply(
            {"params": params, "batch_stats": batch_stats},
            images,
            train=True,
            mutable=["batch_stats"],
        )
        return (
            jnp.mean(mask_loss(mask_true, outputs["output-mask"]))
            + jnp.mean(
                losses_lib.confidence_loss(
                    labels_true, outputs["output-labels"]
                )
            )
            + jnp.mean(
                losses_lib.localization_loss(
                    boxes_true, outputs["output-boxes"]
                )
            )
        )

    loss, grads = jax.value_and_grad(loss_fn)(
        variables["params"], variables["batch_stats"], jnp.asarray(x)
    )
    return float(loss), grads


def test_gradient_parity_full_objective(reference, reference_model):
    cfg = ModelConfig(
        input_image_shape=INPUT_SHAPE,
        number_of_classes=NUM_CLASSES,
        boxes_per_point=(6, 6, 6, 6),
        backbone="mobilenetv2",
        segmentation_dilation_rates=(3, 6, 12),
    )
    module = SsdSegModel(cfg=cfg)
    weights = weights_by_layer_from_keras_model(reference_model)
    variables = import_keras_weights(weights, cfg)

    x, mask_true, labels_true, boxes_true = _synthetic_batch()

    tf_loss, tf_by_layer = _tf_grads(
        reference, reference_model, x, mask_true, labels_true, boxes_true
    )
    jax_loss, jax_grads = _jax_grads(
        module, variables, x, mask_true, labels_true, boxes_true
    )

    assert np.isfinite(tf_loss) and np.isfinite(jax_loss)
    np.testing.assert_allclose(jax_loss, tf_loss, rtol=1e-4)

    # map the flax grad pytree onto keras layer names with the same
    # transform as the weights themselves (grads live in the same tree);
    # BN moving stats are non-trainable so only entries [:2] ([gamma,
    # beta]) of exported BN lists correspond to TF gradients
    exported = export_keras_weights(
        {
            "params": jax.device_get(jax_grads),
            "batch_stats": jax.device_get(variables["batch_stats"]),
        },
        cfg,
    )

    # Comparison metric, calibrated against measured float-noise floors:
    # BN beta grads of blocks followed by another conv+BN are ~zero in
    # exact arithmetic (the downstream BN backward makes incoming grads
    # zero-mean per channel, so the beta sum catastrophically cancels) —
    # our own f32-vs-f64 grads differ by rel 1e4..1e5 on those tensors, so
    # they carry no f32 signal and are gated by an absolute floor tied to
    # the global gradient scale.  A real math/mapping error shows as O(1)
    # relative error on a large-norm tensor; cross-framework (oneDNN vs
    # XLA) reduction-order noise stays under ~3e-2 everywhere else.
    global_norm = max(
        np.linalg.norm(g) for gl in tf_by_layer.values() for g in gl
    )
    checked = 0
    worst = (0.0, None)
    for name, tf_grads_list in tf_by_layer.items():
        assert name in exported, f"no exported grads for layer {name}"
        ours = exported[name][: len(tf_grads_list)]
        for i, (g_tf, g_ours) in enumerate(zip(tf_grads_list, ours)):
            g_ours = np.asarray(g_ours)
            assert g_ours.shape == g_tf.shape, f"{name}[{i}]"
            rel = np.linalg.norm(g_ours - g_tf) / max(
                np.linalg.norm(g_tf), 1e-4 * global_norm
            )
            if rel > worst[0]:
                worst = (float(rel), f"{name}[{i}]")
            assert rel < 5e-2, (
                f"gradient mismatch at {name}[{i}]: rel norm err {rel:.2e}"
            )
            checked += 1
    # every trainable tensor in the network was compared
    n_expected = sum(len(v) for v in tf_by_layer.values())
    assert checked == n_expected and checked > 100, checked
    print(f"gradient parity: {checked} tensors, worst rel err {worst}")
