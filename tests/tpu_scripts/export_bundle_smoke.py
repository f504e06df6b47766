"""TPU smoke for AOT serving bundles: flagship model, fused bf16 path.

Exports the bench.py serving configuration to a MULTI-BATCH bundle
(batches=[1, 16] — the round-4 v2 format with largest-fit routing),
reloads it, checks outputs match the live InferenceModel bit-exactly on
the chip at BOTH batch sizes, times b16 with the pipelined-dispatch
protocol and b1 with the fetch-fenced single-image protocol (VERDICT r4
item 4: reloaded-bundle b1 latency vs the live 2.26 ms; reference nb 03
cell 31 single-image predict).

    python tests/tpu_scripts/export_bundle_smoke.py
"""
import os
import sys
import tempfile
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__)))))


def main() -> None:
    import jax

    from ssdseglib_tpu.boxes import Anchors
    from ssdseglib_tpu.config import reference_warehouse_config
    from ssdseglib_tpu.export import load_serving_bundle
    from ssdseglib_tpu.models import MobileNetV2SsdSegBuilder

    anchors_cfg, enc_cfg, model_cfg, nms_cfg, train_cfg = (
        reference_warehouse_config()
    )
    anchors = Anchors.from_config(anchors_cfg, enc_cfg.image_shape)
    batch = train_cfg.batch_size

    builder = MobileNetV2SsdSegBuilder(
        input_image_shape=model_cfg.input_image_shape,
        number_of_boxes_per_point=list(model_cfg.boxes_per_point),
        number_of_classes=model_cfg.number_of_classes,
        center_x_boxes_default=anchors.center_x,
        center_y_boxes_default=anchors.center_y,
        width_boxes_default=anchors.width,
        height_boxes_default=anchors.height,
        standard_deviations_centroids_offsets=enc_cfg.standard_deviations,
    )
    model = builder.get_model_for_training(
        segmentation_dilation_rates=model_cfg.segmentation_dilation_rates
    )
    variables = model.init(jax.random.key(0))
    infer = builder.get_model_for_inference(
        model_trained=variables,
        max_number_of_boxes_per_class=nms_cfg.max_boxes_per_class,
        max_number_of_boxes_per_sample=nms_cfg.max_boxes_per_sample,
        boxes_iou_threshold=nms_cfg.iou_threshold,
        labels_probability_threshold=nms_cfg.score_threshold,
        suppress_background_boxes=nms_cfg.suppress_background_boxes,
        use_segmentation_suppression=nms_cfg.use_segmentation_suppression,
        compute_dtype="bfloat16",
        fused_backbone=True,
        mask_output="bfloat16",
        input_layout="auto",
        input_layout_batch=batch,
    )

    path = tempfile.mkdtemp(prefix="bundle_")
    t0 = time.perf_counter()
    infer.export_serving_bundle(path, batch=[1, batch])
    print(f"export (batches=[1, {batch}]): "
          f"{time.perf_counter() - t0:.1f}s -> {path}")
    import subprocess

    subprocess.run(["du", "-sh", path])

    t0 = time.perf_counter()
    bundle = load_serving_bundle(path)
    print(
        f"load: {time.perf_counter() - t0:.1f}s "
        f"(compiled_auto sidecar active: {bundle._compiled is not None})"
    )

    rng = np.random.default_rng(0)
    images = rng.uniform(0, 255, (batch, 480, 640, 3)).astype(np.uint8)
    for b_imgs, label in ((images, f"b{batch}"), (images[:1], "b1")):
        mask_live, det_live = infer(b_imgs)
        mask_b, det_b = bundle(b_imgs)
        assert np.array_equal(
            np.asarray(mask_b).astype(np.float32),
            np.asarray(mask_live).astype(np.float32),
        ), f"mask mismatch {label}"
        assert np.array_equal(np.asarray(det_b), np.asarray(det_live)), (
            f"detections mismatch {label}"
        )
        print(f"bit-exact vs live InferenceModel at {label}")

    # bench.py protocol: device-staged distinct inputs, pipelined
    # dispatch, fence by FETCHING a small leaf of the last output
    # (numpy inputs would re-upload 14.7 MB through the relay per call)
    def timed(b, label):
        inputs = [
            b.prepare_input(
                ((images.astype(np.float32) + i) % 256).astype(np.uint8)
            )
            for i in range(8)
        ]
        jax.block_until_ready(inputs)
        outs = [b(inputs[i % 8]) for i in range(4)]  # post-reload warm
        np.asarray(outs[-1][1])
        steps = 32
        rates = []
        for _ in range(3):
            t0 = time.perf_counter()
            outs = [b(inputs[i % 8]) for i in range(steps)]
            np.asarray(outs[-1][1])
            rates.append(steps * batch / (time.perf_counter() - t0))
        print(f"{label}: {sorted(rates)[1]:.1f} img/s (median of 3)")

    timed(bundle, "bundle throughput (compiled_auto sidecar)")

    def timed_b1(b, label):
        """Single-image latency, pipelined-dispatch protocol (the live
        2.26 ms figure's protocol): distinct device-staged b1 inputs,
        fence by fetching a small leaf of the last output."""
        inputs = [
            b.prepare_input(
                ((images[:1].astype(np.float32) + i) % 256).astype(np.uint8)
            )
            for i in range(8)
        ]
        jax.block_until_ready(inputs)
        outs = [b(inputs[i % 8]) for i in range(4)]
        np.asarray(outs[-1][1])
        steps = 64
        lat = []
        for _ in range(3):
            t0 = time.perf_counter()
            outs = [b(inputs[i % 8]) for i in range(steps)]
            np.asarray(outs[-1][1])
            lat.append((time.perf_counter() - t0) / steps * 1e3)
        print(f"{label}: {sorted(lat)[1]:.2f} ms/image (median of 3; "
              f"live baseline 2.26 ms)")

    timed_b1(bundle, "bundle b1 latency")

    # A/B in the same process: the portable StableHLO program alone
    sidecar = os.path.join(path, "compiled_auto.pkl")
    os.rename(sidecar, sidecar + ".off")
    plain = load_serving_bundle(path)
    assert plain._compiled is None
    timed(plain, "bundle throughput (StableHLO only)")


if __name__ == "__main__":
    main()
