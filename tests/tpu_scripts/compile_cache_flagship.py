"""Measure cold-vs-warm flagship serving compile with the persistent
compilation cache through the axon relay.

    python tests/tpu_scripts/compile_cache_flagship.py cold   # populate
    python tests/tpu_scripts/compile_cache_flagship.py warm   # fresh proc
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__)))))

CACHE_DIR = "/tmp/ssdseglib_jax_cache_flagship"


def main(mode: str) -> None:
    os.makedirs(CACHE_DIR, exist_ok=True)
    import jax

    jax.config.update("jax_compilation_cache_dir", CACHE_DIR)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)

    import numpy as np

    from ssdseglib_tpu.boxes import Anchors
    from ssdseglib_tpu.config import reference_warehouse_config
    from ssdseglib_tpu.models import MobileNetV2SsdSegBuilder

    anchors_cfg, enc_cfg, model_cfg, nms_cfg, train_cfg = (
        reference_warehouse_config()
    )
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
    t_build = time.perf_counter()
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
    )
    imgs = np.zeros((train_cfg.batch_size, 480, 640, 3), np.uint8)
    t0 = time.perf_counter()
    out = infer(imgs)
    np.asarray(out[1])
    t1 = time.perf_counter()
    print(
        f"{mode}: first serving call (compile+run) {t1 - t0:.1f}s "
        f"(model build {t0 - t_build:.1f}s)"
    )


if __name__ == "__main__":
    main(sys.argv[1] if len(sys.argv) > 1 else "cold")
