"""ShuffleNetV2 performance story (VERDICT r2 weak #4).

The reference ships ShuffleNetV2 as a first-class alternative backbone
(reference models.py:425-870, notebook 03 cell 12's commented block) but
never trained it.  This script gives the TPU build measured numbers:

1. serving throughput, f32 and bf16, batch 16 at 480x640 (the notebook's
   published '1.5x' configuration with extra depthwise + residuals)
2. a short learning smoke: N fused train steps on synthetic scenes with a
   decreasing loss

Usage: python examples/06_shufflenet_perf.py [--steps 32] [--train-steps 60]
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
from ssdseglib_tpu.config import TrainConfig, reference_warehouse_config
from ssdseglib_tpu.data.pipeline import TrainDataLoader
from ssdseglib_tpu.data.synthetic import generate_dataset
from ssdseglib_tpu.models import ShuffleNetV2SsdSegBuilder
from ssdseglib_tpu.models.builder import TrainableModel
from ssdseglib_tpu.train import Trainer


def main() -> None:
    parser = argparse.ArgumentParser()
    parser.add_argument("--steps", type=int, default=32)
    parser.add_argument("--train-steps", type=int, default=60)
    parser.add_argument("--batch", type=int, default=16)
    parser.add_argument("--model-size", default="1.5x")
    args = parser.parse_args()

    anchors_cfg, enc_cfg, model_cfg, nms_cfg, _ = reference_warehouse_config()
    anchors = Anchors.from_config(anchors_cfg, enc_cfg.image_shape)
    batch = args.batch

    builder = ShuffleNetV2SsdSegBuilder(
        input_image_shape=model_cfg.input_image_shape,
        model_size=args.model_size,
        use_additional_depthwise_convolution=True,
        use_residual_connections=True,
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
        # init on CPU: the flax init program is single-use and its remote
        # TPU compile costs minutes for zero reuse
        with jax.default_device(jax.local_devices(backend="cpu")[0]):
            variables = trainable.init(jax.random.key(0))
    except RuntimeError:
        variables = trainable.init(jax.random.key(0))
    variables = jax.device_put(jax.device_get(variables))
    n_params = sum(
        int(np.prod(p.shape))
        for p in jax.tree_util.tree_leaves(variables["params"])
    )
    print(f"shufflenetv2-{args.model_size}: {n_params:,} trainable params",
          flush=True)

    # ---- serving throughput, f32 vs bf16 -------------------------------
    base = np.random.default_rng(0).uniform(
        0, 255, (batch, 480, 640, 3)
    ).astype(np.float32)
    inputs = [
        jnp.asarray((base + float(i)) % 256.0, dtype=jnp.uint8)
        for i in range(8)
    ]
    jax.block_until_ready(inputs)

    for compute_dtype, mask_output in (
        ("bfloat16", "bfloat16"), ("float32", "float32"),
    ):
        infer = builder.get_model_for_inference(
            model_trained=variables,
            max_number_of_boxes_per_class=nms_cfg.max_boxes_per_class,
            max_number_of_boxes_per_sample=nms_cfg.max_boxes_per_sample,
            boxes_iou_threshold=nms_cfg.iou_threshold,
            labels_probability_threshold=nms_cfg.score_threshold,
            suppress_background_boxes=nms_cfg.suppress_background_boxes,
            use_segmentation_suppression=nms_cfg.use_segmentation_suppression,
            compute_dtype=compute_dtype,
            mask_output=mask_output,
        )
        out = infer(inputs[0])
        jax.block_until_ready(out)
        rates = []
        for _ in range(3):
            t0 = time.perf_counter()
            outs = [infer(inputs[i % len(inputs)]) for i in range(args.steps)]
            # fence by FETCHING the (tiny) detections of the final step:
            # block_until_ready through the relay returned early for this
            # program (0.4 ms/batch readings — physically impossible);
            # a device->host copy cannot complete before the program, and
            # single-device execution order covers every prior step.
            np.asarray(outs[-1][1])
            dt = time.perf_counter() - t0
            rates.append(args.steps * batch / dt)
        rate = sorted(rates)[len(rates) // 2]
        print(
            f"serving {compute_dtype:<9} batch {batch}: "
            f"{rate:7.1f} img/s ({1000.0 * batch / rate:.2f} ms/batch)",
            flush=True,
        )

    # ---- learning smoke ------------------------------------------------
    if args.train_steps:
        loader = TrainDataLoader(
            generate_dataset(
                2 * batch, image_shape=enc_cfg.image_shape, seed=5,
                non_overlapping=True,
            ),
            anchors,
            enc_cfg,
            batch_size=batch,
            augmentation_horizontal_flip=True,
            augmentation_rgb=True,
            shuffle=False,
            seed=0,
        )
        trainer = Trainer(
            model=trainable,
            anchors=anchors,
            config=TrainConfig(
                batch_size=batch, learning_rate=2e-4,
                compute_dtype="bfloat16", adam_mu_dtype="bfloat16",
            ),
        )
        # reuse the CPU-initialized variables (init_state would re-init on
        # TPU: an extra minutes-long remote compile for zero reuse)
        from ssdseglib_tpu.train import TrainState

        state = TrainState.create(
            jax.tree_util.tree_map(jnp.copy, variables), trainer.tx
        )
        step_fn = trainer.fused_train_step_fn(loader.transform)
        raw = [
            (rng, tuple(jax.device_put(a) for a in b))
            for rng, b in loader.iter_raw()
        ]
        jax.block_until_ready(raw)

        # compile + warmup OUTSIDE the timed window (the remote compile is
        # minutes; including it reported 3000 ms/step for a ~70 ms step)
        rng0, b0 = raw[0]
        state, metrics = step_fn(state, rng0, *b0)
        float(np.asarray(metrics["loss"]))

        losses = []
        t0 = time.perf_counter()
        for i in range(args.train_steps):
            rng, b = raw[i % len(raw)]
            state, metrics = step_fn(state, rng, *b)
            if (i + 1) % 10 == 0:
                losses.append(float(np.asarray(metrics["loss"])))
                print(f"  train step {i + 1}: loss {losses[-1]:.3f}",
                      flush=True)
        float(np.asarray(metrics["loss"]))
        dt = time.perf_counter() - t0
        print(
            f"train: {1000.0 * dt / args.train_steps:.1f} ms/step "
            f"({args.train_steps * batch / dt:.0f} img/s) — loss "
            f"{losses[0]:.3f} -> {losses[-1]:.3f}",
            flush=True,
        )
        assert np.isfinite(losses).all() and losses[-1] < losses[0]


if __name__ == "__main__":
    main()
