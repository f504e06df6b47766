"""Real-TPU A/B: `KerasStyleModel.fit` (the compat facade the reference
notebooks drive, after the round-4 fast-path rework) vs `Trainer.fit`
(the native fused-transform fast path) — same synthetic dataset, same
batch size, wall-clock img/s over full epochs in ONE process.

VERDICT r3 item 3 acceptance: compat fit within ~1.2x of Trainer.fit.

The two paths consume different input protocols by design:
- Trainer.fit: raw uint8 batches, augment+encode fused into the jitted
  step (examples/04's regime).
- compat fit: notebook-style (images_f32, one-hot targets) host batches
  (reference notebook 03 cell 8 output); the fast path packs exactly-
  one-hot targets to uint8, prefetches on a producer thread, and stages
  uploads behind a fence.

Run: python tests/tpu_scripts/compat_fit_ab.py
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__)))))

import jax
import numpy as np

from ssdseglib_tpu.boxes import Anchors
from ssdseglib_tpu.config import TrainConfig, reference_warehouse_config
from ssdseglib_tpu.data.pipeline import TrainDataLoader
from ssdseglib_tpu.data.synthetic import generate_dataset
from ssdseglib_tpu.train import Trainer, TrainState
from ssdseglib_tpu.utils.compile_cache import enable_compile_cache

BATCH = 16
SAMPLES = 96
EPOCHS = 3  # first epoch = compile warmup, timed over the rest


def native_arm(anchors, enc_cfg, model_cfg):
    from ssdseglib_tpu.models.builder import SsdSegModel, TrainableModel

    loader = TrainDataLoader(
        generate_dataset(SAMPLES, image_shape=enc_cfg.image_shape, seed=5),
        anchors, enc_cfg, batch_size=BATCH,
        augmentation_horizontal_flip=True, augmentation_rgb=True,
        shuffle=False, seed=0,
    )
    model = TrainableModel(module=SsdSegModel(cfg=model_cfg), cfg=model_cfg)
    trainer = Trainer(
        model=model, anchors=anchors, config=TrainConfig(batch_size=BATCH)
    )
    with jax.default_device(jax.local_devices(backend="cpu")[0]):
        state = trainer.init_state(jax.random.key(0))
    state = jax.device_put(jax.device_get(state))
    state, _ = trainer.fit(state, loader, epochs=1, log_fn=lambda s: None)
    t0 = time.perf_counter()
    state, _ = trainer.fit(
        state, loader, epochs=EPOCHS - 1, log_fn=lambda s: None
    )
    dt = time.perf_counter() - t0
    return (EPOCHS - 1) * SAMPLES / dt


def compat_arm(anchors, enc_cfg, model_cfg):
    import ssdseglib

    # notebook-protocol batches: f32 images + one-hot f32 targets, fully
    # materialized on host (so the arm measures the fit machinery, not
    # per-epoch synthetic-data regeneration)
    loader = TrainDataLoader(
        generate_dataset(SAMPLES, image_shape=enc_cfg.image_shape, seed=5),
        anchors, enc_cfg, batch_size=BATCH,
        augmentation_horizontal_flip=False, augmentation_rgb=False,
        shuffle=False, seed=0,
    )
    host_batches = [
        (np.asarray(images, np.float32),
         {k: np.asarray(v) for k, v in targets.items()})
        for images, targets in loader
    ]

    n = anchors.total_boxes
    builder = ssdseglib.models.MobileNetV2SsdSegBuilder(
        input_image_shape=model_cfg.input_image_shape,
        number_of_boxes_per_point=6,
        number_of_classes=4,
        center_x_boxes_default=np.asarray(anchors.center_x, np.float32),
        center_y_boxes_default=np.asarray(anchors.center_y, np.float32),
        width_boxes_default=np.asarray(anchors.width, np.float32),
        height_boxes_default=np.asarray(anchors.height, np.float32),
        standard_deviations_centroids_offsets=(0.1, 0.1, 0.2, 0.2),
    )
    model = builder.get_model_for_training(
        segmentation_dilation_rates=(3, 6, 12)
    )
    model.compile(
        optimizer=1e-4,
        loss={
            "output-mask": ssdseglib.losses.cross_entropy(
                [0.05, 0.575, 0.135, 0.24]
            ),
            "output-labels": ssdseglib.losses.confidence_loss,
            "output-boxes": ssdseglib.losses.localization_loss,
        },
        loss_weights={"output-mask": 1.0, "output-labels": 1.0,
                      "output-boxes": 1.0},
    )
    model.fit(host_batches, epochs=1, verbose=0)
    t0 = time.perf_counter()
    model.fit(host_batches, epochs=EPOCHS - 1, verbose=0)
    dt = time.perf_counter() - t0
    return (EPOCHS - 1) * len(host_batches) * BATCH / dt


def main():
    enable_compile_cache()
    anchors_cfg, enc_cfg, model_cfg, _, _ = reference_warehouse_config()
    anchors = Anchors.from_config(anchors_cfg, enc_cfg.image_shape)

    rounds = []
    for _ in range(2):
        rounds.append((
            native_arm(anchors, enc_cfg, model_cfg),
            compat_arm(anchors, enc_cfg, model_cfg),
        ))
        print(f"round: native {rounds[-1][0]:.1f} img/s, "
              f"compat {rounds[-1][1]:.1f} img/s", flush=True)
    native = max(r[0] for r in rounds)
    compat = max(r[1] for r in rounds)
    print(f"\nbest-of-2: Trainer.fit {native:.1f} img/s, "
          f"compat fit {compat:.1f} img/s -> ratio {native / compat:.2f}x "
          f"({'PASS' if native / compat <= 1.2 else 'FAIL'} vs 1.2x target)")


if __name__ == "__main__":
    main()
