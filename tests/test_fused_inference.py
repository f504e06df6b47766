"""Fused-backbone inference path parity vs the standard Flax path."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ssdseglib_tpu.config import ModelConfig
from ssdseglib_tpu.models.builder import SsdSegModel
from ssdseglib_tpu.models.fused_inference import make_fused_forward

CFG = ModelConfig(
    input_image_shape=(96, 128, 3),
    number_of_classes=4,
    boxes_per_point=(6, 6, 6, 6),
    backbone="mobilenetv2",
    segmentation_dilation_rates=(3, 6, 12),
)


@pytest.fixture(scope="module")
def setup():
    module = SsdSegModel(cfg=CFG)
    variables = module.init(
        jax.random.key(0), jnp.zeros((1, 96, 128, 3)), train=False
    )
    # non-trivial BN stats so folding matters
    rng = np.random.default_rng(0)
    stats = jax.tree_util.tree_map(
        lambda x: jnp.asarray(rng.uniform(0.5, 1.5, x.shape).astype(np.float32)),
        variables["batch_stats"],
    )
    return module, {"params": variables["params"], "batch_stats": stats}


def test_fused_forward_matches_standard(setup):
    module, variables = setup
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.uniform(0, 255, (2, 96, 128, 3)).astype(np.float32))

    expected = module.apply(variables, x, train=False)
    fused = make_fused_forward(
        CFG, variables, compute_dtype=jnp.float32, interpret=True
    )
    got = fused(x)

    for key in expected:
        np.testing.assert_allclose(
            np.asarray(got[key]), np.asarray(expected[key]),
            rtol=2e-3, atol=2e-3, err_msg=key,
        )


@pytest.mark.parametrize("mode", ["pallas", "xla"])
def test_fused_forward_s2d_stem_matches_standard(setup, mode):
    """The batch-packed s2d stem/block1 reformulations (ops/s2d_stem.py,
    opt-in) must still match the Flax path end-to-end."""
    module, variables = setup
    rng = np.random.default_rng(2)
    x = jnp.asarray(rng.uniform(0, 255, (4, 96, 128, 3)).astype(np.float32))

    expected = module.apply(variables, x, train=False)
    fused = make_fused_forward(
        CFG, variables, compute_dtype=jnp.float32, interpret=True,
        s2d_stem=mode,
    )
    got = fused(x)

    for key in expected:
        np.testing.assert_allclose(
            np.asarray(got[key]), np.asarray(expected[key]),
            rtol=2e-3, atol=2e-3, err_msg=key,
        )


def test_fused_forward_flax_heads_matches_standard(setup):
    """The legacy path (Flax heads module, standalone input rescale) must
    keep matching — it is the reference point the folded-heads path was
    validated against on the real chip."""
    module, variables = setup
    rng = np.random.default_rng(3)
    x = jnp.asarray(rng.uniform(0, 255, (2, 96, 128, 3)).astype(np.float32))

    expected = module.apply(variables, x, train=False)
    fused = make_fused_forward(
        CFG, variables, compute_dtype=jnp.float32, interpret=True,
        fused_heads=False, fold_input_rescale=False,
    )
    got = fused(x)

    for key in expected:
        np.testing.assert_allclose(
            np.asarray(got[key]), np.asarray(expected[key]),
            rtol=2e-3, atol=2e-3, err_msg=key,
        )


def test_fused_forward_off_shape_input_bypasses_rescale_fold(setup):
    """fold_input_rescale's border-correction bias map is specific to
    cfg.input_image_shape; any other spatial shape must trace the
    standalone-rescale path and still match the Flax forward."""
    module, variables = setup
    rng = np.random.default_rng(4)
    x = jnp.asarray(rng.uniform(0, 255, (2, 64, 96, 3)).astype(np.float32))

    expected = module.apply(variables, x, train=False)
    fused = make_fused_forward(
        CFG, variables, compute_dtype=jnp.float32, interpret=True
    )
    got = fused(x)

    for key in expected:
        np.testing.assert_allclose(
            np.asarray(got[key]), np.asarray(expected[key]),
            rtol=2e-3, atol=2e-3, err_msg=key,
        )


def test_fused_forward_uint8_input_matches_float(setup):
    """Raw uint8 input (what the C++ loader emits) through the folded-stem
    path equals the float path bit-for-bit at f32."""
    _, variables = setup
    rng = np.random.default_rng(5)
    x8 = rng.integers(0, 256, (2, 96, 128, 3), dtype=np.uint8)

    fused = make_fused_forward(
        CFG, variables, compute_dtype=jnp.float32, interpret=True
    )
    got8 = fused(jnp.asarray(x8))
    gotf = fused(jnp.asarray(x8.astype(np.float32)))
    for key in gotf:
        np.testing.assert_allclose(
            np.asarray(got8[key]), np.asarray(gotf[key]),
            rtol=1e-6, atol=1e-6, err_msg=key,
        )


def test_fused_forward_rejects_shufflenet(setup):
    _, variables = setup
    cfg = ModelConfig(backbone="shufflenetv2")
    with pytest.raises(ValueError):
        make_fused_forward(cfg, variables)


def test_fused_auto_fallback_above_validated_batch():
    """fused_backbone=True beyond the validated batch ceiling serves
    through the plain-XLA program with a one-time warning instead of
    crashing the compile helper (VERDICT r2 weak #6)."""
    import warnings

    import jax
    import numpy as np

    from ssdseglib_tpu.models import MobileNetV2SsdSegBuilder

    n_boxes = (6 * 8 + 3 * 4 + 2 * 2 + 1 * 1) * 6
    rng = np.random.default_rng(0)
    builder = MobileNetV2SsdSegBuilder(
        input_image_shape=(96, 128, 3),
        number_of_boxes_per_point=6,
        number_of_classes=4,
        center_x_boxes_default=rng.uniform(0, 128, n_boxes).astype(np.float32),
        center_y_boxes_default=rng.uniform(0, 96, n_boxes).astype(np.float32),
        width_boxes_default=rng.uniform(5, 40, n_boxes).astype(np.float32),
        height_boxes_default=rng.uniform(5, 40, n_boxes).astype(np.float32),
        standard_deviations_centroids_offsets=(0.1, 0.1, 0.2, 0.2),
    )
    trainable = builder.get_model_for_training(
        segmentation_dilation_rates=(3, 6, 12)
    )
    variables = trainable.init(jax.random.key(0))
    kwargs = dict(
        model_trained=variables,
        max_number_of_boxes_per_class=4,
        max_number_of_boxes_per_sample=10,
        boxes_iou_threshold=0.5,
        labels_probability_threshold=0.3,
        suppress_background_boxes=False,
        use_segmentation_suppression=False,
    )
    fused = builder.get_model_for_inference(fused_backbone=True, **kwargs)
    plain = builder.get_model_for_inference(**kwargs)

    images = rng.uniform(0, 255, (20, 96, 128, 3)).astype(np.float32)
    with warnings.catch_warnings(record=True) as caught:
        warnings.simplefilter("always")
        mask_f, det_f = fused.predict(images)
        fused.predict(images)  # second call: no second warning
    fallback_warnings = [
        w for w in caught if "falls back" in str(w.message)
    ]
    assert len(fallback_warnings) == 1, [str(w.message) for w in caught]

    mask_p, det_p = plain.predict(images)
    np.testing.assert_allclose(mask_f, mask_p, rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(det_f, det_p, rtol=1e-5, atol=1e-6)


def test_quantized_pointwise_close_to_f32(setup):
    """Opt-in int8 PTQ of the QUANT_TARGETS pointwise convs: mask output
    stays close to the f32 folded path (per-channel weights + calibrated
    per-tensor activation scales), and the detection heads — which do not
    route through the quantized convs — are untouched."""
    module, variables = setup
    rng = np.random.default_rng(7)
    x = jnp.asarray(rng.uniform(0, 255, (2, 96, 128, 3)).astype(np.float32))

    fused = make_fused_forward(
        CFG, variables, compute_dtype=jnp.float32, interpret=True
    )
    quantized = make_fused_forward(
        CFG, variables, compute_dtype=jnp.float32, interpret=True,
        quantize_pointwise=True, calibration_images=np.asarray(x),
    )
    ref = fused(x)
    got = quantized(x)

    # mask: softmax probabilities, int8 rounding tolerance
    np.testing.assert_allclose(
        np.asarray(got["output-mask"]), np.asarray(ref["output-mask"]),
        atol=0.05,
    )
    mean_err = float(np.mean(np.abs(
        np.asarray(got["output-mask"]) - np.asarray(ref["output-mask"])
    )))
    assert mean_err < 5e-3, mean_err
    # detection heads do not pass through the quantized convs
    np.testing.assert_allclose(
        np.asarray(got["output-labels"]), np.asarray(ref["output-labels"]),
        rtol=1e-6, atol=1e-6,
    )
    np.testing.assert_allclose(
        np.asarray(got["output-boxes"]), np.asarray(ref["output-boxes"]),
        rtol=1e-6, atol=1e-6,
    )


def test_calibration_auto_interprets_on_cpu_backend(setup):
    """calibrate_pointwise_scales runs EAGERLY at model-build time (the
    serving programs are lazy jits) — on a CPU backend it must auto-select
    Pallas interpret mode like ops/depthwise_backward._fused_bwd instead
    of crashing with 'Only interpret mode is supported on CPU backend',
    so get_model_for_inference(quantize_pointwise=True) constructs in the
    test environment."""
    from ssdseglib_tpu.models.fused_inference import (
        calibrate_pointwise_scales,
    )

    module, variables = setup
    rng = np.random.default_rng(7)
    imgs = rng.uniform(0, 255, (1, 96, 128, 3)).astype(np.float32)
    amaxes = calibrate_pointwise_scales(CFG, variables, imgs)  # no interpret
    assert amaxes
    # amax 0.0 is legitimate (dead ReLU path under random weights); the
    # quantizer guards with max(amax, 1e-6).  The regression here is
    # "constructs and returns finite stats", not the values themselves.
    assert all(np.isfinite(v) and v >= 0 for v in amaxes.values())


def test_quantized_pointwise_requires_calibration(setup):
    module, variables = setup
    with pytest.raises(ValueError, match="calibration_images"):
        make_fused_forward(
            CFG, variables, interpret=True, quantize_pointwise=True
        )
    with pytest.raises(ValueError, match="fused_heads"):
        make_fused_forward(
            CFG, variables, interpret=True, quantize_pointwise=True,
            fused_heads=False,
            calibration_images=np.zeros((1, 96, 128, 3), np.float32),
        )
