"""Serving-mode tests: bf16 fast path closeness, Split layer, misc mirrors."""

import jax
import numpy as np

from ssdseglib_tpu.layers import Split
from ssdseglib_tpu.models import MobileNetV2SsdSegBuilder


def _builder(n_boxes):
    rng = np.random.default_rng(0)
    return MobileNetV2SsdSegBuilder(
        input_image_shape=(96, 128, 3),
        number_of_boxes_per_point=6,
        number_of_classes=4,
        center_x_boxes_default=rng.uniform(0, 128, n_boxes).astype(np.float32),
        center_y_boxes_default=rng.uniform(0, 96, n_boxes).astype(np.float32),
        width_boxes_default=rng.uniform(5, 40, n_boxes).astype(np.float32),
        height_boxes_default=rng.uniform(5, 40, n_boxes).astype(np.float32),
        standard_deviations_centroids_offsets=(0.1, 0.1, 0.2, 0.2),
    )


def test_bf16_serving_close_to_f32():
    n_boxes = (6 * 8 + 3 * 4 + 2 * 2 + 1 * 1) * 6
    builder = _builder(n_boxes)
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
    inf_f32 = builder.get_model_for_inference(**kwargs)
    inf_bf16 = builder.get_model_for_inference(
        compute_dtype="bfloat16", **kwargs
    )

    rng = np.random.default_rng(1)
    images = rng.uniform(0, 255, (2, 96, 128, 3)).astype(np.float32)
    mask32, det32 = inf_f32.predict(images)
    mask16, det16 = inf_bf16.predict(images)

    assert mask16.dtype == np.float32
    np.testing.assert_allclose(mask16, mask32, atol=0.02)
    # detections: same label set at this loose threshold; box coords close
    np.testing.assert_allclose(det16[..., 0], det32[..., 0], atol=0)
    np.testing.assert_allclose(det16[..., 1], det32[..., 1], atol=0.02)


def test_predict_batched_single_program_any_n():
    """predict_batched serves an arbitrary N through one compiled batch:
    chunks + repeat-pads the ragged tail + slices back.  Real rows must
    be (a) exactly the padded-batch rows by construction and (b) equal
    to serving the tail directly — repeat-padding adds no new classes to
    the batch-global segmentation-suppression presence set (reference
    layers.py:207), so the quirk gates identically."""
    n_boxes = (6 * 8 + 3 * 4 + 2 * 2 + 1 * 1) * 6
    builder = _builder(n_boxes)
    trainable = builder.get_model_for_training(
        segmentation_dilation_rates=(3, 6, 12)
    )
    variables = trainable.init(jax.random.key(0))
    infer = builder.get_model_for_inference(
        model_trained=variables,
        max_number_of_boxes_per_class=4,
        max_number_of_boxes_per_sample=10,
        boxes_iou_threshold=0.5,
        labels_probability_threshold=0.3,
        suppress_background_boxes=False,
        use_segmentation_suppression=True,
    )

    rng = np.random.default_rng(2)
    images = rng.uniform(0, 255, (5, 96, 128, 3)).astype(np.float32)

    mask, det = infer.predict_batched(images, batch=2)
    assert mask.shape[0] == 5 and det.shape[0] == 5

    # full chunks match plain predict on the same pairs
    m01, d01 = infer.predict(images[0:2])
    np.testing.assert_array_equal(mask[0:2], m01)
    np.testing.assert_array_equal(det[0:2], d01)

    # ragged tail: bit-exact vs the repeat-padded batch by construction
    mp, dp = infer.predict(np.concatenate([images[4:5], images[4:5]], 0))
    np.testing.assert_array_equal(mask[4:5], mp[:1])
    np.testing.assert_array_equal(det[4:5], dp[:1])

    # ...and equal to serving the tail image alone (the semantic claim:
    # repeat-padding preserves the batch-global suppression gate; only
    # program-level numeric noise may differ between batch sizes)
    m1, d1 = infer.predict(images[4:5])
    np.testing.assert_allclose(mask[4:5], m1, atol=1e-5)
    np.testing.assert_allclose(det[4:5], d1, atol=1e-4)

    # background filter flows through the shared output conventions
    import pytest

    with pytest.raises(ValueError, match="empty"):
        infer.predict_batched(images[:0], batch=2)
    with pytest.raises(ValueError, match=r"\(N, H, W, C\)"):
        infer.predict_batched(images[0], batch=2)
    # bad batch values fail loudly, not as range()/concatenate errors
    with pytest.raises(ValueError, match="positive int"):
        infer.predict_batched(images, batch=0)
    with pytest.raises(ValueError, match="positive int"):
        infer.predict_batched(images, batch=-4)


def test_split_layer():
    rng = np.random.default_rng(0)
    x = rng.normal(size=(2, 4, 6, 8)).astype(np.float32)
    a, b = Split(num_or_size_splits=2, axis=-1)(x)
    np.testing.assert_array_equal(np.asarray(a), x[..., :4])
    np.testing.assert_array_equal(np.asarray(b), x[..., 4:])

    a, b, c = Split(num_or_size_splits=[1, 3, 4], axis=-1)(x)
    assert a.shape[-1] == 1 and b.shape[-1] == 3 and c.shape[-1] == 4


def test_augmentation_rgb_channels_mirror():
    from ssdseglib_tpu.datacoder import augmentation_rgb_channels

    rng = np.random.default_rng(0)
    images = rng.uniform(0, 255, (2, 8, 8, 3)).astype(np.float32)
    targets = {"output-mask": np.zeros((2, 8, 8, 4), np.float32)}
    out_images, out_targets = augmentation_rgb_channels(
        images, targets, key=jax.random.key(0)
    )
    assert out_images.shape == images.shape
    assert out_targets is targets
    assert float(np.asarray(out_images).min()) >= 0.0
    assert float(np.asarray(out_images).max()) <= 255.0


def test_read_image_mirror(tmp_path):
    from PIL import Image

    from ssdseglib_tpu.datacoder import read_image

    rng = np.random.default_rng(0)
    arr = rng.integers(0, 256, (10, 12, 3), dtype=np.uint8)
    path = str(tmp_path / "img.png")
    Image.fromarray(arr).save(path)
    out = read_image(path)
    assert out.dtype == np.float32
    np.testing.assert_array_equal(out.astype(np.uint8), arr)


def test_mask_output_formats():
    """mask_output='bfloat16'/'class_map' match the f32 probabilities
    (VERDICT r2 item 2: kill the f32 mask materialization)."""
    import jax.numpy as jnp

    n_boxes = (6 * 8 + 3 * 4 + 2 * 2 + 1 * 1) * 6
    builder = _builder(n_boxes)
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
    rng = np.random.default_rng(1)
    images = rng.uniform(0, 255, (2, 96, 128, 3)).astype(np.float32)

    inf_f32 = builder.get_model_for_inference(**kwargs)
    inf_bf16 = builder.get_model_for_inference(mask_output="bfloat16", **kwargs)
    inf_map = builder.get_model_for_inference(mask_output="class_map", **kwargs)

    mask32, det32 = inf_f32.predict(images)
    mask16, det16 = inf_bf16.predict(images)
    maskm, detm = inf_map.predict(images)

    assert mask16.dtype == np.float32  # predict up-casts for consumers
    np.testing.assert_allclose(mask16, mask32, atol=4e-3)
    assert maskm.dtype == np.uint8 and maskm.shape == (2, 96, 128)
    np.testing.assert_array_equal(maskm, np.argmax(mask32, axis=-1))
    # detections identical (mask format does not touch the det path)
    np.testing.assert_allclose(det16, det32, atol=0)
    np.testing.assert_allclose(detm, det32, atol=0)

    # raw device output keeps the requested dtype
    raw_mask, _ = inf_bf16(images)
    assert raw_mask.dtype == jnp.bfloat16

    import pytest

    with pytest.raises(ValueError, match="mask_output"):
        builder.get_model_for_inference(mask_output="float64", **kwargs)


def test_runtime_tunable_nms_thresholds():
    """set_nms_operating_point reproduces a freshly-built model at the new
    thresholds without recompiling; instances over the same architecture
    share one serving program."""
    from ssdseglib_tpu.models.builder import _serving_programs

    n_boxes = (6 * 8 + 3 * 4 + 2 * 2 + 1 * 1) * 6
    builder = _builder(n_boxes)
    trainable = builder.get_model_for_training(
        segmentation_dilation_rates=(3, 6, 12)
    )
    variables = trainable.init(jax.random.key(0))
    base = dict(
        model_trained=variables,
        max_number_of_boxes_per_class=4,
        max_number_of_boxes_per_sample=10,
        suppress_background_boxes=False,
        use_segmentation_suppression=True,
    )
    rng = np.random.default_rng(2)
    images = rng.uniform(0, 255, (2, 96, 128, 3)).astype(np.float32)

    inf_a = builder.get_model_for_inference(
        boxes_iou_threshold=0.5, labels_probability_threshold=0.3, **base
    )
    inf_b = builder.get_model_for_inference(
        boxes_iou_threshold=0.1, labels_probability_threshold=0.6, **base
    )
    # both instances resolved to the SAME cached serving program
    assert inf_a._forward_program is inf_b._forward_program

    _, det_b = inf_b.predict(images)
    inf_a.set_nms_operating_point(
        boxes_iou_threshold=0.1, labels_probability_threshold=0.6
    )
    _, det_a = inf_a.predict(images)
    np.testing.assert_allclose(det_a, det_b, atol=0)


def test_input_layout_auto_matches_default():
    """input_layout='auto' (AOT executable with XLA-chosen input formats)
    must reproduce the default program exactly: staged inputs via
    prepare_input, fallback on off-shape batches, threshold retune, and
    update_variables restaging all covered."""
    import jax.numpy as jnp

    n_boxes = (6 * 8 + 3 * 4 + 2 * 2 + 1 * 1) * 6
    builder = _builder(n_boxes)
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
        use_segmentation_suppression=True,
    )
    rng = np.random.default_rng(9)
    images = rng.uniform(0, 255, (2, 96, 128, 3)).astype(np.uint8)

    inf_default = builder.get_model_for_inference(**kwargs)
    inf_auto = builder.get_model_for_inference(
        input_layout="auto", input_layout_batch=2, **kwargs
    )
    assert inf_auto._auto is not None

    mask_d, det_d = inf_default(images)
    staged = inf_auto.prepare_input(images)
    mask_a, det_a = inf_auto(staged)
    np.testing.assert_allclose(
        np.asarray(mask_a), np.asarray(mask_d), atol=1e-6
    )
    np.testing.assert_allclose(np.asarray(det_a), np.asarray(det_d), atol=1e-6)

    # off-shape batch falls back to the regular program
    images3 = rng.uniform(0, 255, (3, 96, 128, 3)).astype(np.uint8)
    mask3, det3 = inf_auto(images3)
    mask3_d, det3_d = inf_default(images3)
    np.testing.assert_allclose(np.asarray(mask3), np.asarray(mask3_d), atol=1e-6)
    np.testing.assert_allclose(np.asarray(det3), np.asarray(det3_d), atol=1e-6)

    # runtime threshold retune flows into the AUTO executable
    inf_auto.set_nms_operating_point(labels_probability_threshold=0.9)
    inf_default.set_nms_operating_point(labels_probability_threshold=0.9)
    _, det_hi_a = inf_auto(inf_auto.prepare_input(images))
    _, det_hi_d = inf_default(images)
    np.testing.assert_allclose(
        np.asarray(det_hi_a), np.asarray(det_hi_d), atol=1e-6
    )

    # weight swap restages the AUTO operands
    variables2 = trainable.init(jax.random.key(1))
    inf_auto.update_variables(variables2)
    inf_default.update_variables(variables2)
    _, det_v2_a = inf_auto(inf_auto.prepare_input(images))
    _, det_v2_d = inf_default(images)
    np.testing.assert_allclose(
        np.asarray(det_v2_a), np.asarray(det_v2_d), atol=1e-6
    )

    import pytest

    with pytest.raises(ValueError, match="input_layout"):
        builder.get_model_for_inference(input_layout="bogus", **kwargs)
