"""Model structure tests: parameter parity with the published summary,
output shapes, finiteness, and the end-to-end inference path."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ssdseglib_tpu.config import ModelConfig
from ssdseglib_tpu.models import (
    MobileNetV2SsdSegBuilder,
    ShuffleNetV2SsdSegBuilder,
    SsdSegModel,
    count_parameters,
)

# published parameter counts (BASELINE.md / reference nb 03 cell 12)
REF_TRAINABLE = 4_009_920
REF_TOTAL = 4_047_408


@pytest.fixture(scope="module")
def small_cfg():
    """Reduced input resolution for fast structural tests; channel plan and
    anchor grid dims scale with the input so parameter count is unchanged."""
    return ModelConfig(
        input_image_shape=(96, 128, 3),
        number_of_classes=4,
        boxes_per_point=(6, 6, 6, 6),
        backbone="mobilenetv2",
        segmentation_dilation_rates=(3, 6, 12),
    )


@pytest.fixture(scope="module")
def small_variables(small_cfg):
    module = SsdSegModel(cfg=small_cfg)
    return module, module.init(
        jax.random.key(0), jnp.zeros((1, 96, 128, 3)), train=False
    )


def test_parameter_count_matches_reference(small_variables):
    _, variables = small_variables
    trainable, stats = count_parameters(variables)
    assert trainable == REF_TRAINABLE
    assert trainable + stats == REF_TOTAL


def test_training_output_shapes(small_variables):
    module, variables = small_variables
    x = jnp.zeros((2, 96, 128, 3))
    out = module.apply(variables, x, train=False)
    n_boxes = (6 * 8 + 3 * 4 + 2 * 2 + 1 * 1) * 6  # 4 pyramid levels
    assert out["output-mask"].shape == (2, 96, 128, 4)
    assert out["output-labels"].shape == (2, n_boxes, 4)
    assert out["output-boxes"].shape == (2, n_boxes, 4)


def test_outputs_finite_and_normalized(small_variables):
    module, variables = small_variables
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.uniform(0, 255, (1, 96, 128, 3)), dtype=jnp.float32)
    out = module.apply(variables, x, train=False)
    for v in out.values():
        assert np.all(np.isfinite(np.asarray(v)))
    np.testing.assert_allclose(
        np.asarray(out["output-mask"]).sum(-1), 1.0, rtol=1e-5
    )
    np.testing.assert_allclose(
        np.asarray(out["output-labels"]).sum(-1), 1.0, rtol=1e-5
    )


def test_train_mode_updates_batch_stats(small_variables):
    module, variables = small_variables
    x = jnp.ones((1, 96, 128, 3)) * 100.0
    _, mutated = module.apply(
        variables, x, train=True, mutable=["batch_stats"]
    )
    before = jax.tree_util.tree_leaves(variables["batch_stats"])
    after = jax.tree_util.tree_leaves(mutated["batch_stats"])
    changed = any(
        not np.allclose(np.asarray(b), np.asarray(a)) for b, a in zip(before, after)
    )
    assert changed


def test_shufflenet_builds_and_runs():
    cfg = ModelConfig(
        input_image_shape=(96, 128, 3),
        number_of_classes=4,
        boxes_per_point=(6, 6, 6, 6),
        backbone="shufflenetv2",
        shufflenet_size="0.5x",
        shufflenet_extra_depthwise=True,
        shufflenet_residuals=True,
    )
    module = SsdSegModel(cfg=cfg)
    variables = module.init(jax.random.key(0), jnp.zeros((1, 96, 128, 3)))
    out = module.apply(variables, jnp.ones((1, 96, 128, 3)) * 127.0)
    assert out["output-mask"].shape == (1, 96, 128, 4)
    for v in out.values():
        assert np.all(np.isfinite(np.asarray(v)))
    # shufflenet detection taps: os16/os32/os64/os128 pyramid
    n_boxes = (6 * 8 + 3 * 4 + 2 * 2 + 1 * 1) * 6
    assert out["output-labels"].shape == (1, n_boxes, 4)


def _tiny_anchor_args(n_boxes):
    rng = np.random.default_rng(0)
    return dict(
        center_x_boxes_default=rng.uniform(0, 128, n_boxes).astype(np.float32),
        center_y_boxes_default=rng.uniform(0, 96, n_boxes).astype(np.float32),
        width_boxes_default=rng.uniform(5, 40, n_boxes).astype(np.float32),
        height_boxes_default=rng.uniform(5, 40, n_boxes).astype(np.float32),
        standard_deviations_centroids_offsets=(0.1, 0.1, 0.2, 0.2),
    )


def test_builder_end_to_end_inference():
    n_boxes = (6 * 8 + 3 * 4 + 2 * 2 + 1 * 1) * 6
    builder = MobileNetV2SsdSegBuilder(
        input_image_shape=(96, 128, 3),
        number_of_boxes_per_point=6,
        number_of_classes=4,
        **_tiny_anchor_args(n_boxes),
    )
    trainable = builder.get_model_for_training(
        segmentation_architecture="deeplabv3plus",
        object_detection_architecture="ssdlite",
        segmentation_dilation_rates=(3, 6, 12),
    )
    variables = trainable.init(jax.random.key(1))
    inference = builder.get_model_for_inference(
        model_trained=variables,
        max_number_of_boxes_per_class=4,
        max_number_of_boxes_per_sample=10,
        boxes_iou_threshold=0.5,
        labels_probability_threshold=0.3,
        suppress_background_boxes=False,
        use_segmentation_suppression=True,
    )
    rng = np.random.default_rng(0)
    images = rng.uniform(0, 255, (2, 96, 128, 3)).astype(np.float32)
    mask, detections = inference.predict(images)
    assert mask.shape == (2, 96, 128, 4)
    assert detections.shape == (2, 10, 6)
    assert np.all(np.isfinite(detections))


def test_inference_update_variables_and_raw_outputs():
    """Weight swap without recompile + the pre-NMS raw-output surface
    (feeds the NMS grid search in examples/04)."""
    n_boxes = (6 * 8 + 3 * 4 + 2 * 2 + 1 * 1) * 6
    builder = MobileNetV2SsdSegBuilder(
        input_image_shape=(96, 128, 3),
        number_of_boxes_per_point=6,
        number_of_classes=4,
        **_tiny_anchor_args(n_boxes),
    )
    trainable = builder.get_model_for_training(
        segmentation_dilation_rates=(3, 6, 12)
    )
    v1 = trainable.init(jax.random.key(1))
    v2 = trainable.init(jax.random.key(2))
    inference = builder.get_model_for_inference(
        model_trained=v1,
        max_number_of_boxes_per_class=4,
        max_number_of_boxes_per_sample=10,
        boxes_iou_threshold=0.5,
        labels_probability_threshold=0.3,
        suppress_background_boxes=False,
        use_segmentation_suppression=True,
    )
    rng = np.random.default_rng(0)
    images = rng.uniform(0, 255, (2, 96, 128, 3)).astype(np.float32)

    mask, labels, boxes_yx = inference.raw_outputs(images)
    assert mask.shape == (2, 96, 128, 4)
    assert labels.shape == (2, n_boxes, 4)
    assert boxes_yx.shape == (2, n_boxes, 4)
    # gated labels came out of a softmax (+ suppression zeros)
    assert float(jnp.max(labels)) <= 1.0 + 1e-5

    mask_a, _ = inference.predict(images)
    inference.update_variables(v2)
    mask_b, _ = inference.predict(images)
    assert not np.allclose(mask_a, mask_b)  # weights actually swapped

    # fused path refuses the swap (folded weights baked into the jit)
    fused = builder.get_model_for_inference(
        model_trained=v1,
        max_number_of_boxes_per_class=4,
        max_number_of_boxes_per_sample=10,
        boxes_iou_threshold=0.5,
        labels_probability_threshold=0.3,
        suppress_background_boxes=False,
        use_segmentation_suppression=True,
        fused_backbone=True,
    )
    with pytest.raises(ValueError):
        fused.update_variables(v2)


def test_detection_head_relu_cap_knob():
    """detection_head_relu_max=0.0 (uncapped extension) must lift the
    reference's ReLU6 confidence ceiling e^6/(e^6+C-1) ~ 0.9926
    (reference models.py:259 applies ReLU6 to the class logits)."""
    import dataclasses

    from ssdseglib_tpu.models.builder import SsdSegModel

    base = ModelConfig(
        input_image_shape=(96, 128, 3),
        number_of_classes=4,
        boxes_per_point=(6, 6, 6, 6),
        segmentation_dilation_rates=(3, 6, 12),
    )
    uncapped = dataclasses.replace(base, detection_head_relu_max=0.0)

    x = jnp.asarray(
        np.random.default_rng(0).uniform(0, 255, (1, 96, 128, 3)),
        jnp.float32,
    )
    ceiling = float(np.exp(6) / (np.exp(6) + 3))

    m1 = SsdSegModel(cfg=base)
    v1 = m1.init(jax.random.key(0), x, train=False)
    # scale params up so head logits exceed the cap
    big = jax.tree_util.tree_map(lambda a: a * 4.0, v1["params"])
    out1 = m1.apply({"params": big, "batch_stats": v1["batch_stats"]}, x, train=False)
    assert float(jnp.max(out1["output-labels"])) <= ceiling + 1e-4

    m2 = SsdSegModel(cfg=uncapped)
    out2 = m2.apply({"params": big, "batch_stats": v1["batch_stats"]}, x, train=False)
    assert float(jnp.max(out2["output-labels"])) > ceiling + 1e-4


def test_shufflenet_builder_validates_size():
    with pytest.raises(ValueError):
        ShuffleNetV2SsdSegBuilder(
            input_image_shape=(96, 128, 3),
            model_size="3x",
            use_additional_depthwise_convolution=False,
            use_residual_connections=False,
            number_of_boxes_per_point=6,
            number_of_classes=4,
            **_tiny_anchor_args(10),
        )
