"""Probe 2 (follow-up to fused_b32_split_probe.py): the two-program
split FAILED — prog_a (fused backbone+heads, no postprocess) alone
crashes the remote-compile helper at b32 AND b64, so the limit lives in
the fused BACKBONE graph, not in graph-cumulative size.

Arithmetic: `fused_mbconv` batch-chunks every Pallas call to <=16, so
the b16 full backbone holds ~10 Pallas sub-calls (compiles) while b32
holds ~20 (crashes) — hypothesis: the helper limit tracks Pallas
sub-calls (or Mosaic compile memory) PER PROGRAM.  This probe splits the
backbone itself at a block boundary: program A = stem + blocks 1..CUT,
program B = blocks CUT+1..16, program C = folded heads + seg-suppression
+ decode + NMS.  At b32/CUT=8 each half holds ~8-12 sub-calls — under
the known-good b16 budget.

Also probes plain-XLA AUTO at b96/b128 (above examples/09's b64 peak
1507.7 img/s) for a possible new peak row.

Run: python tests/tpu_scripts/fused_split_bisect_probe.py
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
    parser.add_argument("--cut", type=int, default=8)
    parser.add_argument("--plain-batches", default="96,128")
    parser.add_argument("--steps", type=int, default=32)
    args = parser.parse_args()

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
    from ssdseglib_tpu.models.fused_inference import (
        _SEQUENCES,
        _conv,
        fold_heads,
        fold_mobilenetv2,
        heads_forward_folded,
    )
    from ssdseglib_tpu.ops.fused_mbconv import fused_mbconv
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
    cfg = model.cfg

    folded_f32 = fold_mobilenetv2(variables)
    cast = lambda t: jax.tree_util.tree_map(
        lambda a: jnp.asarray(a, jnp.bfloat16), t
    )
    folded = cast(folded_f32)
    heads_folded = cast(fold_heads(variables, cfg))

    def run_blocks(x, lo, hi, taps):
        """Fused-backbone blocks lo..hi (mirrors
        mobilenetv2_features_fused's loop, models/fused_inference.py:390+);
        mutates `taps`, returns x."""
        block = 0
        for expansion, channels_out, n_repeat, stride in _SEQUENCES:
            for n in range(n_repeat):
                block += 1
                if block < lo or block > hi:
                    continue
                we, be = folded[f"backbone-block{block}-expand"]
                wd, bd = folded[f"backbone-block{block}-depthwise"]
                wp, bp = folded[f"backbone-block{block}-project"]
                if n == 0:
                    e = _conv(x, we, be, relu6=True)
                    taps[f"block{block}-expand"] = e
                    d = _conv(e, wd, bd, stride=stride, depthwise=True,
                              relu6=True)
                    x = _conv(d, wp, bp)
                else:
                    x = fused_mbconv(x, we, be, wd, bd, wp, bp, residual=True)
            if lo <= block <= hi:
                taps[f"block{block}-out"] = x
        return x

    cut = args.cut

    @jax.jit
    def prog_a(images):
        x = images.astype(jnp.bfloat16) / 127.5 - 1.0
        we, be = folded["backbone-block0-expand"]
        wd, bd = folded["backbone-block0-depthwise"]
        wp, bp = folded["backbone-block0-project"]
        x = _conv(x, we, be, stride=2, relu6=True)
        x = _conv(x, wd, bd, depthwise=True, relu6=True)
        x = _conv(x, wp, bp)
        taps = {}
        x = run_blocks(x, 1, cut, taps)
        return x, taps["block3-expand"]  # skip tap (os4)

    @jax.jit
    def prog_b(x):
        taps = {}
        x = run_blocks(x, cut + 1, 16, taps)
        return taps["block13-expand"], x  # fm1 (os16), fm2 (os32)

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
    def prog_c(fm1, fm2, skip, iou_thr, score_thr):
        out = heads_forward_folded(cfg, heads_folded, fm1, fm2, skip)
        mask = out["output-mask"]
        labels = out["output-labels"].astype(jnp.float32)
        labels = seg_suppression(mask, labels)
        boxes_yx = decode_predictions_to_corners_yx(
            out["output-boxes"].astype(jnp.float32), anchors_centroids, stds
        )
        detections = nms_core(
            boxes_yx, labels, iou_threshold=iou_thr, score_threshold=score_thr
        )
        return _format_mask(mask, "bfloat16"), detections

    rng = np.random.default_rng(0)

    def parity_check(images_u8):
        """Split-pipeline output == the production fused b16 program."""
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
        mask_ref, det_ref = infer(images_u8)
        x, skip = prog_a(images_u8)
        fm1, fm2 = prog_b(x)
        mask_s, det_s = prog_c(fm1, fm2, skip, iou, score)
        m_ok = np.array_equal(
            np.asarray(mask_s).astype(np.float32),
            np.asarray(mask_ref).astype(np.float32),
        )
        d_ok = np.array_equal(np.asarray(det_s), np.asarray(det_ref))
        # the production b16 graph folds the input rescale into the stem
        # (fold_stem_rescale); this probe uses the plain rescale, so allow
        # tolerance instead of bit-equality on the bf16 path
        if not (m_ok and d_ok):
            md = np.max(np.abs(
                np.asarray(mask_s).astype(np.float32)
                - np.asarray(mask_ref).astype(np.float32)
            ))
            dd = np.max(np.abs(np.asarray(det_s) - np.asarray(det_ref)))
            print(f"  parity b16: mask max|d|={md:.3e} det max|d|={dd:.3e} "
                  f"(rescale-folding formulation difference expected)")
        else:
            print("  parity b16: bit-exact")

    print("[b16] parity check vs production fused program...", flush=True)
    parity_check(rng.uniform(0, 255, (16, 480, 640, 3)).astype(np.uint8))

    for batch in [int(b) for b in args.batches.split(",") if b]:
        images = [
            jax.device_put(
                rng.uniform(0, 255, (batch, 480, 640, 3)).astype(np.uint8)
            )
            for _ in range(4)
        ]
        jax.block_until_ready(images)
        ok = True
        print(f"[b{batch}] compiling prog_a (stem+blocks1..{cut})...",
              flush=True)
        try:
            t0 = time.perf_counter()
            a0 = prog_a(images[0])
            jax.block_until_ready(a0)
            print(f"[b{batch}] prog_a ok in {time.perf_counter()-t0:.1f}s",
                  flush=True)
            print(f"[b{batch}] compiling prog_b (blocks{cut + 1}..16)...",
                  flush=True)
            t0 = time.perf_counter()
            b0 = prog_b(a0[0])
            jax.block_until_ready(b0)
            print(f"[b{batch}] prog_b ok in {time.perf_counter()-t0:.1f}s",
                  flush=True)
            print(f"[b{batch}] compiling prog_c (heads+postprocess)...",
                  flush=True)
            t0 = time.perf_counter()
            c0 = prog_c(b0[0], b0[1], a0[1], iou, score)
            jax.block_until_ready(c0)
            print(f"[b{batch}] prog_c ok in {time.perf_counter()-t0:.1f}s",
                  flush=True)
        except Exception as e:  # noqa: BLE001 — the probed failure mode
            print(f"[b{batch}] COMPILE FAILED: {type(e).__name__}: "
                  f"{str(e)[:200]}", flush=True)
            ok = False
        if not ok:
            continue

        def run(steps):
            outs = None
            for i in range(steps):
                x, skip = prog_a(images[i % 4])
                fm1, fm2 = prog_b(x)
                outs = prog_c(fm1, fm2, skip, iou, score)
            np.asarray(outs[1])

        run(4)
        rates = []
        for _ in range(3):
            t0 = time.perf_counter()
            run(args.steps)
            rates.append(args.steps * batch / (time.perf_counter() - t0))
        rate = sorted(rates)[1]
        print(f"[b{batch}] SPLIT fused three-program: {rate:.1f} img/s "
              f"({1000.0 * batch / rate:.2f} ms/batch)", flush=True)

    # plain-XLA AUTO above the known b64 peak
    for batch in [int(b) for b in args.plain_batches.split(",") if b]:
        print(f"[plain b{batch}] building AUTO-layout model...", flush=True)
        try:
            infer = builder.get_model_for_inference(
                model_trained=variables,
                max_number_of_boxes_per_class=nms_cfg.max_boxes_per_class,
                max_number_of_boxes_per_sample=nms_cfg.max_boxes_per_sample,
                boxes_iou_threshold=nms_cfg.iou_threshold,
                labels_probability_threshold=nms_cfg.score_threshold,
                suppress_background_boxes=nms_cfg.suppress_background_boxes,
                use_segmentation_suppression=(
                    nms_cfg.use_segmentation_suppression
                ),
                compute_dtype="bfloat16",
                fused_backbone=False,
                mask_output="bfloat16",
                input_layout="auto",
                input_layout_batch=batch,
            )
            staged = [
                infer.prepare_input(
                    rng.uniform(0, 255, (batch, 480, 640, 3)).astype(np.uint8)
                )
                for _ in range(4)
            ]
            jax.block_until_ready(staged)
            outs = [infer(staged[i % 4]) for i in range(4)]
            np.asarray(outs[-1][1])
        except Exception as e:  # noqa: BLE001
            print(f"[plain b{batch}] FAILED: {type(e).__name__}: "
                  f"{str(e)[:200]}", flush=True)
            continue
        rates = []
        for _ in range(3):
            t0 = time.perf_counter()
            outs = [infer(staged[i % 4]) for i in range(args.steps)]
            np.asarray(outs[-1][1])
            rates.append(args.steps * batch / (time.perf_counter() - t0))
        rate = sorted(rates)[1]
        print(f"[plain b{batch}] AUTO: {rate:.1f} img/s "
              f"({1000.0 * batch / rate:.2f} ms/batch; b64 peak was "
              f"1507.7)", flush=True)


if __name__ == "__main__":
    main()
