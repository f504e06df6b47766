"""MFU / roofline accounting for the published serving + training numbers.

Computes FLOPs for the flagship programs (MobileNetV2 + SSDLite +
DeepLabV3+, 480x640, batch 16 — the reference's published configuration,
reference notebook 03 cells 2/12) from XLA's own HLO cost analysis of the
lowered programs, then derives MFU at the measured v5e device times so the
"at MXU peak" claims in docs/PERFORMANCE.md are externally checkable
(VERDICT r3 item 8).

Runs entirely on CPU (jit.lower + cost_analysis never executes the
program), so it does not need the chip and can run next to a TPU job.

Conventions:
- FLOPs are XLA HloCostAnalysis over the UNOPTIMIZED lowered module —
  the platform-neutral model-FLOPs convention (fusion never changes conv
  FLOPs, which dominate both programs; elementwise over-counting vs the
  optimized TPU module is < a few %).
- v5e peaks: 197 TFLOP/s bf16 MXU, 819 GB/s HBM (public chip specs).
- Device times are the measured round-3/4 figures (docs/PERFORMANCE.md):
  serving 10.36 ms/batch-16, training 58.9 ms/step bf16 b16.

Usage: python tests/tpu_scripts/mfu_accounting.py
"""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__)))))

import jax

jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402

V5E_PEAK_BF16_TFLOPS = 197.0
V5E_HBM_GBPS = 819.0

# measured device times (docs/PERFORMANCE.md, perfetto-profiled)
SERVING_MS_B16 = 10.36
TRAIN_MS_B16 = 58.9
# per-op profile rows (round-3 perfetto traces)
MASK_DECODER_FWD_MS = 2.61
MASK_DECODER_BWD_MS = 5.37


def flops_of(lowered) -> float:
    cost = lowered.cost_analysis()
    if isinstance(cost, (list, tuple)):
        cost = cost[0]
    return float(cost["flops"])


def build_flagship():
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
    return builder, anchors, model_cfg, nms_cfg, train_cfg


def serving_flops(builder, model_cfg, nms_cfg, batch: int) -> float:
    """Lower the exact plain-XLA serving program (the same math the fused
    bf16 path computes — BN folding and Pallas kernels change scheduling,
    not FLOPs) and return its cost-analysis FLOPs."""
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
        mask_output="bfloat16",
    )
    images = jax.ShapeDtypeStruct((batch, 480, 640, 3), jnp.uint8)
    thr = jax.ShapeDtypeStruct((), jnp.float32)
    lowered = infer._forward_program.lower(
        infer.variables, infer._anchors_centroids, images, thr, thr
    )
    return flops_of(lowered)


def train_flops(builder, model_cfg, train_cfg, batch: int) -> float:
    """Lower the exact bf16 train step (examples/07's measured config) and
    return its cost-analysis FLOPs."""
    import dataclasses

    from ssdseglib_tpu.models.builder import SsdSegModel, TrainableModel
    from ssdseglib_tpu.train import Trainer
    from ssdseglib_tpu.boxes import Anchors
    from ssdseglib_tpu.config import reference_warehouse_config

    anchors_cfg, enc_cfg, _, _, _ = reference_warehouse_config()
    anchors = Anchors.from_config(anchors_cfg, enc_cfg.image_shape)
    model = TrainableModel(module=SsdSegModel(cfg=model_cfg), cfg=model_cfg)
    cfg = dataclasses.replace(
        train_cfg, batch_size=batch, compute_dtype="bfloat16"
    )
    trainer = Trainer(model=model, anchors=anchors, config=cfg)
    state = trainer.init_state(jax.random.key(0))
    step = trainer.train_step_fn()
    n_anchors = anchors.center_x.shape[0]
    images = jax.ShapeDtypeStruct((batch, 480, 640, 3), jnp.float32)
    targets = {
        "output-mask": jax.ShapeDtypeStruct(
            (batch, 480, 640, 4), jnp.float32
        ),
        "output-labels": jax.ShapeDtypeStruct(
            (batch, n_anchors, 4), jnp.float32
        ),
        "output-boxes": jax.ShapeDtypeStruct(
            (batch, n_anchors, 4), jnp.float32
        ),
    }
    lowered = step.lower(state, images, targets)
    return flops_of(lowered)


def main() -> None:
    batch = 16
    builder, anchors, model_cfg, nms_cfg, train_cfg = build_flagship()

    fl_serve = serving_flops(builder, model_cfg, nms_cfg, batch)
    fl_train = train_flops(builder, model_cfg, train_cfg, batch)

    serve_tflops = fl_serve / (SERVING_MS_B16 * 1e-3) / 1e12
    train_tflops = fl_train / (TRAIN_MS_B16 * 1e-3) / 1e12
    serve_mfu = serve_tflops / V5E_PEAK_BF16_TFLOPS
    train_mfu = train_tflops / V5E_PEAK_BF16_TFLOPS

    # the hottest single op, hand-derived: mask-decoder 3x3 conv
    # 304->256 @120x160 (blocks.py decoder refinement, reference
    # blocks.py:117-124) — fwd = 2*k*k*Cin*Cout*H*W*B FLOPs
    conv_fl = 2 * 9 * 304 * 256 * 120 * 160 * batch
    conv_fwd_tflops = conv_fl / (MASK_DECODER_FWD_MS * 1e-3) / 1e12
    # backward = dgrad + wgrad = 2x forward FLOPs
    conv_bwd_tflops = 2 * conv_fl / (MASK_DECODER_BWD_MS * 1e-3) / 1e12

    print(f"serving  program: {fl_serve / 1e9:8.1f} GFLOP/batch-16 "
          f"({fl_serve / batch / 1e9:.1f}/img) @ {SERVING_MS_B16} ms "
          f"-> {serve_tflops:6.1f} TFLOP/s = {serve_mfu * 100:4.1f}% MFU")
    print(f"training program: {fl_train / 1e9:8.1f} GFLOP/step-16  "
          f"({fl_train / batch / 1e9:.1f}/img) @ {TRAIN_MS_B16} ms "
          f"-> {train_tflops:6.1f} TFLOP/s = {train_mfu * 100:4.1f}% MFU")
    print(f"mask-decoder 3x3 conv fwd : {conv_fl / 1e9:6.1f} GFLOP @ "
          f"{MASK_DECODER_FWD_MS} ms -> {conv_fwd_tflops:6.1f} TFLOP/s = "
          f"{conv_fwd_tflops / V5E_PEAK_BF16_TFLOPS * 100:4.1f}% of bf16 peak")
    print(f"mask-decoder 3x3 conv bwd : {2 * conv_fl / 1e9:6.1f} GFLOP @ "
          f"{MASK_DECODER_BWD_MS} ms -> {conv_bwd_tflops:6.1f} TFLOP/s = "
          f"{conv_bwd_tflops / V5E_PEAK_BF16_TFLOPS * 100:4.1f}% of bf16 peak")
    print(json.dumps({
        "serving_gflop_per_batch16": round(fl_serve / 1e9, 1),
        "serving_mfu_pct": round(serve_mfu * 100, 1),
        "train_gflop_per_step16": round(fl_train / 1e9, 1),
        "train_mfu_pct": round(train_mfu * 100, 1),
        "mask_decoder_fwd_pct_peak": round(
            conv_fwd_tflops / V5E_PEAK_BF16_TFLOPS * 100, 1
        ),
        "mask_decoder_bwd_pct_peak": round(
            conv_bwd_tflops / V5E_PEAK_BF16_TFLOPS * 100, 1
        ),
    }))


if __name__ == "__main__":
    main()
