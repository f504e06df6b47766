"""ShuffleNetV2 activation parity vs the reference Keras model via the
weight importer — validates the author-untested backbone path (reference
README.md:13,19) wiring end to end.

Note the reference's ShuffleNet head/mask blocks use Keras
``ReLU(max_value=0.0)`` which zeroes activations (blocks.py:154 default);
we read 0.0 as an uncapped ReLU (documented deviation), so parity here is
checked on the *backbone feature taps*, which use plain ReLU in both.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from ssdseglib_tpu.config import ModelConfig
from ssdseglib_tpu.keras_import import (
    build_layer_maps,
    import_keras_weights,
    weights_by_layer_from_keras_model,
)
from ssdseglib_tpu.models.shufflenetv2 import ShuffleNetV2Backbone

INPUT_SHAPE = (96, 128, 3)


@pytest.fixture(
    scope="module", params=[(False, False), (True, True)],
    ids=["plain", "extra-dw+residual"],
)
def variant(request):
    return request.param


@pytest.fixture(scope="module")
def reference_shufflenet(reference, variant):
    extra_dw, residuals = variant
    rng = np.random.default_rng(0)
    n_boxes = (6 * 8 + 3 * 4 + 2 * 2 + 1 * 1) * 6
    builder = reference.models.ShuffleNetV2SsdSegBuilder(
        input_image_shape=INPUT_SHAPE,
        model_size="0.5x",
        use_additional_depthwise_convolution=extra_dw,
        use_residual_connections=residuals,
        number_of_boxes_per_point=6,
        number_of_classes=4,
        center_x_boxes_default=rng.uniform(0, 128, n_boxes).astype(np.float32),
        center_y_boxes_default=rng.uniform(0, 96, n_boxes).astype(np.float32),
        width_boxes_default=rng.uniform(5, 40, n_boxes).astype(np.float32),
        height_boxes_default=rng.uniform(5, 40, n_boxes).astype(np.float32),
        standard_deviations_centroids_offsets=(0.1, 0.1, 0.2, 0.2),
    )
    model = builder.get_model_for_training(
        segmentation_architecture="deeplabv3plus",
        object_detection_architecture="ssdlite",
        segmentation_dilation_rates=(3, 6, 12),
    )
    return model


def test_backbone_activation_parity(reference_shufflenet, variant):
    import tensorflow as tf

    extra_dw, residuals = variant
    cfg = ModelConfig(
        input_image_shape=INPUT_SHAPE,
        number_of_classes=4,
        boxes_per_point=(6, 6, 6, 6),
        backbone="shufflenetv2",
        shufflenet_size="0.5x",
        shufflenet_extra_depthwise=extra_dw,
        shufflenet_residuals=residuals,
    )
    weights = weights_by_layer_from_keras_model(reference_shufflenet)
    variables = import_keras_weights(weights, cfg)

    backbone = ShuffleNetV2Backbone(
        model_size="0.5x",
        use_additional_depthwise_convolution=extra_dw,
        use_residual_connections=residuals,
    )
    # backbone-only variables (drop the head entries)
    bb_vars = {
        "params": variables["params"]["backbone"],
        "batch_stats": variables["batch_stats"]["backbone"],
    }

    rng = np.random.default_rng(1)
    x = rng.uniform(0, 255, (2,) + INPUT_SHAPE).astype(np.float32)
    # reference rescaling layer (models.py:622)
    x_scaled = x / 127.5 - 1.0
    _, taps = backbone.apply(bb_vars, jnp.asarray(x_scaled), train=False)

    # pull the same tap activations from the Keras graph
    for stage, n_blocks in ((2, 3), (3, 7), (4, 3)):
        tap_name = f"backbone-stage{stage}-block{n_blocks}"
        keras_layer = f"{tap_name}-reshape-post-channels-shuffle"
        sub = tf.keras.Model(
            inputs=reference_shufflenet.get_layer("backbone-input").output,
            outputs=reference_shufflenet.get_layer(keras_layer).output,
        )
        ref_out = np.asarray(sub(x, training=False))
        np.testing.assert_allclose(
            np.asarray(taps[tap_name]), ref_out, rtol=1e-3, atol=1e-4,
            err_msg=tap_name,
        )


def test_layer_map_covers_keras_weights(reference_shufflenet, variant):
    """Every weighted Keras layer must appear in the importer's mapping."""
    extra_dw, residuals = variant
    cfg = ModelConfig(
        input_image_shape=INPUT_SHAPE,
        number_of_classes=4,
        boxes_per_point=(6, 6, 6, 6),
        backbone="shufflenetv2",
        shufflenet_size="0.5x",
        shufflenet_extra_depthwise=extra_dw,
        shufflenet_residuals=residuals,
    )
    mapped = set()
    for m in build_layer_maps(cfg):
        mapped.add(m.keras_conv)
        if m.keras_bn:
            mapped.add(m.keras_bn)
    keras_layers = set(weights_by_layer_from_keras_model(reference_shufflenet))
    missing = keras_layers - mapped
    assert not missing, f"unmapped keras layers: {sorted(missing)[:10]}"
