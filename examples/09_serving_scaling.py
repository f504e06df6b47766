"""Serving batch-size scaling on the round-3 path (VERDICT r2 weak #5 /
PERFORMANCE.md canonical table).

Measures the public serving pipeline (bf16, fused backbone where
validated with auto-fallback above, uint8 inputs, bf16 mask output, AUTO
input layout per batch) across batch sizes, with the honest fetch-fence
protocol (docs/PERFORMANCE.md measurement pitfalls).

Usage: python examples/09_serving_scaling.py [--batches 1,4,16,32,64]
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# persistent XLA compile cache: fresh processes reuse compiled
# programs (20-40 s/program on this relay) — utils/compile_cache.py
from ssdseglib_tpu.utils.compile_cache import enable_compile_cache

enable_compile_cache()

import argparse
import time

import jax
import jax.numpy as jnp
import numpy as np

from ssdseglib_tpu.boxes import Anchors
from ssdseglib_tpu.config import reference_warehouse_config
from ssdseglib_tpu.models import MobileNetV2SsdSegBuilder


def main() -> None:
    parser = argparse.ArgumentParser()
    parser.add_argument("--batches", default="1,4,16,32,64")
    parser.add_argument("--steps", type=int, default=32)
    args = parser.parse_args()
    batches = [int(b) for b in args.batches.split(",")]

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
    trainable = builder.get_model_for_training(
        segmentation_dilation_rates=model_cfg.segmentation_dilation_rates
    )
    try:
        with jax.default_device(jax.local_devices(backend="cpu")[0]):
            variables = trainable.init(jax.random.key(0))
    except RuntimeError:
        variables = trainable.init(jax.random.key(0))
    variables = jax.device_put(jax.device_get(variables))

    rng = np.random.default_rng(0)
    for batch in batches:
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
        base = rng.uniform(0, 255, (batch, 480, 640, 3)).astype(np.float32)
        inputs = [
            infer.prepare_input(((base + float(i)) % 256.0).astype(np.uint8))
            for i in range(8)
        ]
        jax.block_until_ready(inputs)
        out = infer(inputs[0])
        jax.block_until_ready(out)
        np.asarray(out[1])

        rates = []
        for _ in range(3):
            t0 = time.perf_counter()
            outs = [infer(inputs[i % len(inputs)]) for i in range(args.steps)]
            np.asarray(outs[-1][1])  # fetch-fence (see module docstring)
            dt = time.perf_counter() - t0
            rates.append(args.steps * batch / dt)
        rate = sorted(rates)[len(rates) // 2]
        backbone = (
            "fused"
            if infer._fused_max_batch is None or batch <= infer._fused_max_batch
            else "plain-XLA (auto-fallback)"
        )
        print(
            f"batch {batch:3d} [{backbone:>24s}]: {rate:7.1f} img/s "
            f"({1000.0 * batch / rate:6.2f} ms/batch)",
            flush=True,
        )


if __name__ == "__main__":
    main()
