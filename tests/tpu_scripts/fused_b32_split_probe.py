"""Probe: fused-backbone serving ABOVE the b16 compile ceiling by
SPLITTING the serving graph into two compiled programs (VERDICT r4
item 6).

Background (docs/PERFORMANCE.md "batch > 16 root cause"): the FULL fused
serving graph at b32 crashes this container's remote-compile helper
(HTTP 500 — a cumulative helper resource limit, environmental) even
though every Pallas call is chunked <=16 and the plain-XLA graph at b32
compiles fine.  Hypothesis: two half-size programs (A = fused backbone +
heads, B = seg-suppression + box decode + NMS + mask format) each stay
under the helper's limit, and pipelined A->B dispatch with
device-resident intermediates recovers fused throughput at b32/b64 —
potentially above the plain-XLA b64 peak (1507.7 img/s, examples/09).

Each phase prints BEFORE compiling so a helper crash is attributable.

Run: python tests/tpu_scripts/fused_b32_split_probe.py [--batches 32,64]
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__)))))

import numpy as np


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--batches", default="32,64")
    parser.add_argument("--steps", type=int, default=32)
    args = parser.parse_args()
    batches = [int(b) for b in args.batches.split(",")]

    import jax
    import jax.numpy as jnp

    from ssdseglib_tpu.boxes import Anchors
    from ssdseglib_tpu.config import reference_warehouse_config
    from ssdseglib_tpu.layers import (
        NonMaximumSuppression,
        SegmentationSuppression,
    )
    from ssdseglib_tpu.models import MobileNetV2SsdSegBuilder
    from ssdseglib_tpu.models.builder import _format_mask
    from ssdseglib_tpu.models.fused_inference import make_fused_forward
    from ssdseglib_tpu.ops.encoding import decode_predictions_to_corners_yx
    from ssdseglib_tpu.utils.compile_cache import enable_compile_cache

    enable_compile_cache()
    anchors_cfg, enc_cfg, model_cfg, nms_cfg, _ = reference_warehouse_config()
    anchors = Anchors.from_config(anchors_cfg, enc_cfg.image_shape)

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
    cfg = model.cfg if hasattr(model, "cfg") else builder._model_cfg

    fused = make_fused_forward(cfg, variables, compute_dtype=jnp.bfloat16)
    anchors_centroids = jnp.asarray(anchors.centroids, jnp.float32)
    stds = enc_cfg.standard_deviations
    seg_suppression = SegmentationSuppression(num_classes=4)
    nms_core = NonMaximumSuppression(
        max_number_of_boxes_per_class=nms_cfg.max_boxes_per_class,
        max_number_of_boxes_per_sample=nms_cfg.max_boxes_per_sample,
        boxes_iou_threshold=0.0,
        labels_probability_threshold=0.0,
        suppress_background_boxes=False,
        max_candidates_per_class=nms_cfg.max_candidates_per_class,
    )
    iou = jnp.float32(nms_cfg.iou_threshold)
    score = jnp.float32(nms_cfg.score_threshold)

    @jax.jit
    def prog_a(images):
        out = fused(images)
        return (
            out["output-mask"],
            out["output-labels"].astype(jnp.float32),
            out["output-boxes"].astype(jnp.float32),
        )

    @jax.jit
    def prog_b(mask, labels, boxes, iou_thr, score_thr):
        labels = seg_suppression(mask, labels)
        boxes_yx = decode_predictions_to_corners_yx(
            boxes, anchors_centroids, stds
        )
        detections = nms_core(
            boxes_yx, labels, iou_threshold=iou_thr, score_threshold=score_thr
        )
        return _format_mask(mask, "bfloat16"), detections

    # reference arm: the production auto-fallback (plain-XLA backbone) at
    # the same batch, same process — examples/09's configuration
    def plain_model(batch):
        return builder.get_model_for_inference(
            model_trained=variables,
            max_number_of_boxes_per_class=nms_cfg.max_boxes_per_class,
            max_number_of_boxes_per_sample=nms_cfg.max_boxes_per_sample,
            boxes_iou_threshold=nms_cfg.iou_threshold,
            labels_probability_threshold=nms_cfg.score_threshold,
            suppress_background_boxes=nms_cfg.suppress_background_boxes,
            use_segmentation_suppression=nms_cfg.use_segmentation_suppression,
            compute_dtype="bfloat16",
            fused_backbone=True,  # auto-falls-back above b16
            mask_output="bfloat16",
            input_layout="auto",
            input_layout_batch=batch,
        )

    rng = np.random.default_rng(0)
    for batch in batches:
        images_host = [
            rng.uniform(0, 255, (batch, 480, 640, 3)).astype(np.uint8)
            for _ in range(4)
        ]
        images_dev = [jax.device_put(x) for x in images_host]
        jax.block_until_ready(images_dev)

        print(f"[b{batch}] compiling prog_a (fused backbone+heads)...",
              flush=True)
        t0 = time.perf_counter()
        try:
            a0 = prog_a(images_dev[0])
            jax.block_until_ready(a0)
        except Exception as e:  # noqa: BLE001 — the probed failure mode
            print(f"[b{batch}] prog_a COMPILE FAILED: {type(e).__name__}: "
                  f"{str(e)[:300]}")
            continue
        print(f"[b{batch}] prog_a compiled in {time.perf_counter()-t0:.1f}s",
              flush=True)

        print(f"[b{batch}] compiling prog_b (postprocess)...", flush=True)
        t0 = time.perf_counter()
        try:
            b0 = prog_b(*a0, iou, score)
            jax.block_until_ready(b0)
        except Exception as e:  # noqa: BLE001
            print(f"[b{batch}] prog_b COMPILE FAILED: {type(e).__name__}: "
                  f"{str(e)[:300]}")
            continue
        print(f"[b{batch}] prog_b compiled in {time.perf_counter()-t0:.1f}s",
              flush=True)

        # pipelined two-program serving: dispatch A(i+1) while B(i) runs;
        # intermediates stay device-resident; fetch-fence the final leaf
        def run(steps):
            outs = None
            for i in range(steps):
                inter = prog_a(images_dev[i % 4])
                outs = prog_b(*inter, iou, score)
            np.asarray(outs[1])

        run(4)  # warm
        rates = []
        for _ in range(3):
            t0 = time.perf_counter()
            run(args.steps)
            rates.append(args.steps * batch / (time.perf_counter() - t0))
        split_rate = sorted(rates)[1]
        print(f"[b{batch}] SPLIT fused two-program: {split_rate:.1f} img/s "
              f"({1000.0 * batch / split_rate:.2f} ms/batch)", flush=True)

        print(f"[b{batch}] building plain-XLA reference arm...", flush=True)
        infer = plain_model(batch)
        staged = [infer.prepare_input(x) for x in images_host]
        jax.block_until_ready(staged)
        outs = [infer(staged[i % 4]) for i in range(4)]
        np.asarray(outs[-1][1])
        rates = []
        for _ in range(3):
            t0 = time.perf_counter()
            outs = [infer(staged[i % 4]) for i in range(args.steps)]
            np.asarray(outs[-1][1])
            rates.append(args.steps * batch / (time.perf_counter() - t0))
        plain_rate = sorted(rates)[1]
        print(f"[b{batch}] plain-XLA AUTO (production fallback): "
              f"{plain_rate:.1f} img/s "
              f"({1000.0 * batch / plain_rate:.2f} ms/batch) -> split is "
              f"{split_rate / plain_rate:.3f}x", flush=True)


if __name__ == "__main__":
    main()
