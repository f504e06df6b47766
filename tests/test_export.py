"""AOT serving bundles (`ssdseglib_tpu.export`): save / reload / bit-exact.

The bundle replaces the reference's code-shipping deployment
(`model.save` / `load_model`, reference notebook 03 cells 19/25) with a
serialized StableHLO program + operands; a reloaded bundle must reproduce
the live `InferenceModel` exactly, including runtime NMS retuning.
"""

import json
import os

import numpy as np
import pytest

import jax

from ssdseglib_tpu.export import load_serving_bundle, save_serving_bundle
from ssdseglib_tpu.models import MobileNetV2SsdSegBuilder

N_BOXES = (6 * 8 + 3 * 4 + 2 * 2 + 1 * 1) * 6


def _infer(suppress_background_boxes=False, **kw):
    rng = np.random.default_rng(0)
    builder = MobileNetV2SsdSegBuilder(
        input_image_shape=(96, 128, 3),
        number_of_boxes_per_point=6,
        number_of_classes=4,
        center_x_boxes_default=rng.uniform(0, 128, N_BOXES).astype(np.float32),
        center_y_boxes_default=rng.uniform(0, 96, N_BOXES).astype(np.float32),
        width_boxes_default=rng.uniform(5, 40, N_BOXES).astype(np.float32),
        height_boxes_default=rng.uniform(5, 40, N_BOXES).astype(np.float32),
        standard_deviations_centroids_offsets=(0.1, 0.1, 0.2, 0.2),
    )
    trainable = builder.get_model_for_training(
        segmentation_dilation_rates=(3, 6, 12)
    )
    variables = trainable.init(jax.random.key(0))
    return builder.get_model_for_inference(
        model_trained=variables,
        max_number_of_boxes_per_class=4,
        max_number_of_boxes_per_sample=10,
        boxes_iou_threshold=0.4,
        labels_probability_threshold=0.3,
        suppress_background_boxes=suppress_background_boxes,
        use_segmentation_suppression=True,
        **kw,
    )


def _images(batch=2):
    rng = np.random.default_rng(1)
    return rng.uniform(0, 255, (batch, 96, 128, 3)).astype(np.uint8)


def test_bundle_roundtrip_bit_exact(tmp_path):
    infer = _infer()
    path = str(tmp_path / "bundle")
    save_serving_bundle(infer, path, batch=2)

    bundle = load_serving_bundle(path)
    images = _images()
    mask_live, det_live = infer(images)
    mask_b, det_b = bundle(images)
    np.testing.assert_array_equal(np.asarray(mask_b), np.asarray(mask_live))
    np.testing.assert_array_equal(np.asarray(det_b), np.asarray(det_live))

    # predict() convenience mirrors InferenceModel conventions
    mask_np, det_np = bundle.predict(images)
    assert mask_np.dtype == np.float32
    np.testing.assert_array_equal(det_np, np.asarray(det_live))


def test_bundle_bf16_operands_roundtrip(tmp_path):
    """bf16 weights survive the npz void-bytes round trip (view-cast)."""
    infer = _infer(compute_dtype="bfloat16", mask_output="bfloat16")
    path = str(tmp_path / "bundle16")
    save_serving_bundle(infer, path, batch=2)

    bundle = load_serving_bundle(path)
    images = _images()
    mask_live, det_live = infer(images)
    mask_b, det_b = bundle(images)
    assert np.asarray(mask_b).dtype == np.asarray(mask_live).dtype
    np.testing.assert_array_equal(
        np.asarray(mask_b).astype(np.float32),
        np.asarray(mask_live).astype(np.float32),
    )
    np.testing.assert_array_equal(np.asarray(det_b), np.asarray(det_live))


def test_bundle_predict_applies_background_filter(tmp_path):
    """A bundle exported from a suppress_background_boxes=True model must
    apply the same host-side class-0 filter as InferenceModel.predict
    (reference layers.py:165-166) — recorded in metadata."""
    infer = _infer(suppress_background_boxes=True)
    path = str(tmp_path / "bundle_bg")
    save_serving_bundle(infer, path, batch=2)
    bundle = load_serving_bundle(path)
    assert bundle.metadata["suppress_background_boxes"] is True

    images = _images()
    mask_live, det_live = infer.predict(images)
    mask_b, det_b = bundle.predict(images)
    np.testing.assert_array_equal(mask_b, mask_live)
    np.testing.assert_array_equal(det_b, det_live)
    # the filter flattens to (K, 6) rows, all non-background
    assert det_b.ndim == 2 and det_b.shape[1] == 6
    assert (det_b[:, 0] > 0.0).all()


def test_bundle_predict_batched_any_n(tmp_path):
    """The deployed bundle serves any N through its one baked batch size
    (chunk + repeat-pad + slice), mirroring
    InferenceModel.predict_batched — no other program exists in a bundle,
    so ragged tails would otherwise be unservable."""
    infer = _infer()
    path = str(tmp_path / "bundle_any_n")
    save_serving_bundle(infer, path, batch=2)
    bundle = load_serving_bundle(path)

    images = _images(batch=5)
    mask, det = bundle.predict_batched(images)
    assert mask.shape[0] == 5 and det.shape[0] == 5

    # full chunks match the plain bundle call
    m01, d01 = bundle.predict(images[0:2])
    np.testing.assert_array_equal(mask[0:2], m01)
    np.testing.assert_array_equal(det[0:2], d01)

    # ragged tail: bit-exact vs the repeat-padded batch by construction
    mp, dp = bundle.predict(np.concatenate([images[4:5], images[4:5]], 0))
    np.testing.assert_array_equal(mask[4:5], mp[:1])
    np.testing.assert_array_equal(det[4:5], dp[:1])

    with pytest.raises(ValueError, match="empty"):
        bundle.predict_batched(images[:0])
    with pytest.raises(ValueError, match=r"\(N, H, W, C\)"):
        bundle.predict_batched(images[0])


def test_bundle_multi_batch_programs(tmp_path):
    """A multi-batch bundle (batch=(1, 2)) bakes one program per size
    sharing ONE stored operand set, serves each size exactly, and
    predict_batched routes largest-fit — a single image runs the b1
    program (not repeat-padded to the big batch), VERDICT r3 item 5."""
    infer = _infer()
    path = str(tmp_path / "bundle_multi")
    save_serving_bundle(infer, path, batch=(2, 1))
    # one operands.npz, two programs
    assert os.path.exists(os.path.join(path, "program_b1.stablehlo"))
    assert os.path.exists(os.path.join(path, "program_b2.stablehlo"))
    assert not os.path.exists(os.path.join(path, "program.stablehlo"))

    bundle = load_serving_bundle(path)
    assert bundle.batches == [1, 2]
    images = _images(batch=5)

    # exact-batch calls match the live model at BOTH sizes
    for b in (1, 2):
        mask_live, det_live = infer(images[:b])
        mask_b, det_b = bundle(images[:b])
        np.testing.assert_array_equal(np.asarray(mask_b), np.asarray(mask_live))
        np.testing.assert_array_equal(np.asarray(det_b), np.asarray(det_live))

    # any-N routing: 5 = 2+2+1, no padded rows; matches per-chunk calls
    mask, det = bundle.predict_batched(images)
    assert mask.shape[0] == 5 and det.shape[0] == 5
    m_tail, d_tail = bundle.predict(images[4:5])
    np.testing.assert_array_equal(mask[4:5], m_tail)
    np.testing.assert_array_equal(det[4:5], d_tail)

    # unsupported exact batch still guarded, message lists baked sizes
    with pytest.raises(ValueError, match=r"1\|2"):
        bundle(images[:3])


def test_plan_batched_chunks():
    from ssdseglib_tpu.utils.serving import plan_batched_chunks

    assert plan_batched_chunks(5, (1, 2)) == [(2, 2), (2, 2), (1, 1)]
    assert plan_batched_chunks(1, (16,)) == [(1, 16)]
    assert plan_batched_chunks(35, (16, 1)) == [
        (16, 16), (16, 16), (1, 1), (1, 1), (1, 1),
    ]
    assert plan_batched_chunks(3, (2, 16)) == [(2, 2), (1, 2)]
    with pytest.raises(ValueError):
        plan_batched_chunks(0, (1,))
    with pytest.raises(ValueError):
        plan_batched_chunks(4, ())


def test_bundle_nms_retune_without_recompile(tmp_path):
    """Thresholds stay runtime args of the exported program."""
    infer = _infer()
    path = str(tmp_path / "bundle_tune")
    save_serving_bundle(infer, path, batch=2)
    bundle = load_serving_bundle(path)
    images = _images()

    infer.set_nms_operating_point(
        boxes_iou_threshold=0.1, labels_probability_threshold=0.9
    )
    bundle.set_nms_operating_point(
        boxes_iou_threshold=0.1, labels_probability_threshold=0.9
    )
    _, det_live = infer(images)
    _, det_b = bundle(images)
    np.testing.assert_array_equal(np.asarray(det_b), np.asarray(det_live))


def test_bundle_shape_guard(tmp_path):
    infer = _infer()
    path = str(tmp_path / "bundle_guard")
    save_serving_bundle(infer, path, batch=2)
    bundle = load_serving_bundle(path)
    with pytest.raises(ValueError, match="exported for images of shape"):
        bundle(_images(batch=3))


def test_bundle_metadata(tmp_path):
    infer = _infer()
    path = str(tmp_path / "bundle_meta")
    save_serving_bundle(infer, path, batch=4)
    bundle = load_serving_bundle(path)
    meta = bundle.metadata
    assert meta["batch"] == 4
    assert meta["image_shape"] == [4, 96, 128, 3]
    assert meta["image_dtype"] == "uint8"
    assert meta["platforms"]  # current backend recorded
    assert meta["default_score_threshold"] == pytest.approx(0.3)


def test_bundle_rejects_mesh():
    infer = _infer()
    infer.mesh = object()  # simulate a mesh-built model
    with pytest.raises(ValueError, match="single-device"):
        save_serving_bundle(infer, "/tmp/nope", batch=2)


def test_bundle_ships_and_loads_compiled_auto_executable(tmp_path):
    """With input_layout='auto', the bundle carries the compiled
    AUTO-layout executable and a same-hardware reload serves through it
    bit-exactly (docs/PERFORMANCE.md round 3: restores the live model's
    1422 img/s vs 1363 through the portable StableHLO program)."""
    infer = _infer(input_layout="auto", input_layout_batch=2)
    path = str(tmp_path / "bundle_auto")
    save_serving_bundle(infer, path, batch=2)
    assert os.path.exists(os.path.join(path, "compiled_auto.pkl"))

    bundle = load_serving_bundle(path)
    assert bundle._compiled is not None, "sidecar should load on same HW"
    images = _images()
    mask_live, det_live = infer(infer.prepare_input(images))
    staged = bundle.prepare_input(images)
    mask_b, det_b = bundle(staged)
    np.testing.assert_array_equal(np.asarray(mask_live), np.asarray(mask_b))
    np.testing.assert_array_equal(np.asarray(det_live), np.asarray(det_b))

    # unstaged host input works too (device_put staging inside __call__)
    mask_c, det_c = bundle(images)
    np.testing.assert_array_equal(np.asarray(det_b), np.asarray(det_c))

    # NMS retune flows through the compiled executable (runtime args)
    bundle.set_nms_operating_point(labels_probability_threshold=0.9)
    infer.set_nms_operating_point(labels_probability_threshold=0.9)
    _, det_live2 = infer(infer.prepare_input(images))
    _, det_b2 = bundle(bundle.prepare_input(images))
    np.testing.assert_array_equal(np.asarray(det_live2), np.asarray(det_b2))


def test_bundle_compiled_sidecar_optional_and_fallback(tmp_path):
    infer_auto = _infer(input_layout="auto", input_layout_batch=2)
    # include_compiled=False: no sidecar written
    p1 = str(tmp_path / "no_sidecar")
    save_serving_bundle(infer_auto, p1, batch=2, include_compiled=False)
    assert not os.path.exists(os.path.join(p1, "compiled_auto.pkl"))
    assert load_serving_bundle(p1)._compiled is None

    # no AUTO program (default layout): no sidecar either
    p2 = str(tmp_path / "no_auto")
    save_serving_bundle(_infer(), p2, batch=2)
    assert not os.path.exists(os.path.join(p2, "compiled_auto.pkl"))

    # foreign-hardware bundle: metadata mismatch -> silent fallback to the
    # portable StableHLO program, results still exact
    p3 = str(tmp_path / "foreign")
    save_serving_bundle(infer_auto, p3, batch=2)
    meta_path = os.path.join(p3, "metadata.json")
    meta = json.loads(open(meta_path).read())
    meta["compiled_auto"]["device_kind"] = "some other chip"
    open(meta_path, "w").write(json.dumps(meta))
    bundle = load_serving_bundle(p3)
    assert bundle._compiled is None
    images = _images()
    mask_live, det_live = infer_auto(images)
    mask_b, det_b = bundle(images)
    np.testing.assert_array_equal(np.asarray(det_live), np.asarray(det_b))
    np.testing.assert_array_equal(np.asarray(mask_live), np.asarray(mask_b))
