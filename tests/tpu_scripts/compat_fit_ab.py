"""Real-TPU fit A/B at the SAME data regime (VERDICT r4 item 7): every
arm trains from the SAME on-disk PNG/CSV dataset, full epochs, wall-clock
img/s, interleaved in ONE process (relay drift discipline), best-of-2.

Arms:
  native-disk   `Trainer.fit` + `TrainDataLoader` over the files
                (decode on host -> fused augment+encode in the jitted
                step).  Epoch >= 2 exercises the round-5 cross-epoch
                sample cache (utils/sample_cache.py).
  compat-tfdata `KerasStyleModel.fit(ds_train)` — the ACTUAL reference
                notebook call (reference notebook 03 cells 8/16): tf.data
                from_tensor_slices -> shuffle -> map(read_and_encode,
                AUTOTUNE) -> batch -> map(augmentation_rgb_channels) ->
                prefetch, through the round-5 packed wire (uint8 masks /
                images, on-device color jitter).
  compat-bf16   same pipeline with compile(compute_dtype='bfloat16').

Pass criterion (VERDICT r3 item 3, restated fairly): compat-tfdata
within ~1.2x of native-disk.

Run: python tests/tpu_scripts/compat_fit_ab.py
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__)))))

import numpy as np

BATCH = 16
SAMPLES = 96
EPOCHS = 3  # epoch 1 = compile + cache warmup, timed over the rest
DATA_DIR = "/tmp/fit_ab_data"


def ensure_dataset():
    """Idempotent on-disk synthetic dataset (480x640 PNG/PNG/CSV),
    keyed by a manifest (count/seed/options/generator hash) so a stale
    /tmp dir from an older generator regenerates — same rule as
    examples/05's split manifests (ADVICE r4)."""
    import hashlib
    import inspect

    from PIL import Image

    from ssdseglib_tpu.data import synthetic as _synthetic
    from ssdseglib_tpu.data.synthetic import generate_sample

    manifest = {
        "count": SAMPLES,
        "seed": 5,
        "non_overlapping": True,
        "generator_version": hashlib.blake2b(
            inspect.getsource(_synthetic).encode(), digest_size=8
        ).hexdigest(),
    }
    path_json = f"{DATA_DIR}/triples.json"
    path_manifest = f"{DATA_DIR}/manifest.json"
    if os.path.exists(path_json) and os.path.exists(path_manifest):
        triples = json.load(open(path_json))
        if json.load(open(path_manifest)) == manifest and all(
            os.path.exists(p) for t in triples for p in t
        ):
            return [tuple(t) for t in triples]
    os.makedirs(DATA_DIR, exist_ok=True)
    triples = []
    for i in range(SAMPLES):
        s = generate_sample(i, image_shape=(480, 640), seed=5,
                            non_overlapping=True)
        pi, pm, pl = (f"{DATA_DIR}/{i}-image.png", f"{DATA_DIR}/{i}-mask.png",
                      f"{DATA_DIR}/{i}-boxes.csv")
        Image.fromarray(s.image).save(pi)
        Image.fromarray(s.mask).save(pm)
        with open(pl, "w") as f:
            for label, (x0, y0, x1, y1) in zip(s.labels, s.boxes):
                f.write(f"{int(label)},{x0:.0f},{y0:.0f},{x1:.0f},{y1:.0f}\r\n")
        triples.append((pi, pm, pl))
    json.dump(triples, open(path_json, "w"))
    json.dump(manifest, open(path_manifest, "w"))
    return triples


def native_arm(triples, anchors, enc_cfg, model_cfg):
    import jax

    from ssdseglib_tpu.config import TrainConfig
    from ssdseglib_tpu.data.pipeline import TrainDataLoader
    from ssdseglib_tpu.models.builder import SsdSegModel, TrainableModel
    from ssdseglib_tpu.train import Trainer

    loader = TrainDataLoader(
        triples, anchors, enc_cfg, batch_size=BATCH,
        augmentation_horizontal_flip=True, augmentation_rgb=True,
        shuffle=True, seed=0,
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
    steps = len(loader) * (EPOCHS - 1)
    return steps * BATCH / dt


def compat_arm(triples, anchors, enc_cfg, model_cfg, compute_dtype="float32"):
    import tensorflow as tf

    import ssdseglib

    # the verbatim notebook pipeline (reference notebook 03 cells 2/3)
    coder = ssdseglib.datacoder.DataEncoderDecoder(
        num_classes=4,
        image_shape=enc_cfg.image_shape,
        center_x_boxes_default=np.asarray(anchors.center_x, np.float32),
        center_y_boxes_default=np.asarray(anchors.center_y, np.float32),
        width_boxes_default=np.asarray(anchors.width, np.float32),
        height_boxes_default=np.asarray(anchors.height, np.float32),
        iou_threshold=0.525,
        standard_deviations_centroids_offsets=(0.1, 0.1, 0.2, 0.2),
        augmentation_horizontal_flip=True,
    )
    pi, pm, pl = map(list, zip(*triples))
    ds_train = (
        tf.data.Dataset.from_tensor_slices((pi, pm, pl))
        .shuffle(buffer_size=len(pi))
        .map(coder.read_and_encode, num_parallel_calls=tf.data.AUTOTUNE)
        .batch(batch_size=BATCH)
        .map(ssdseglib.datacoder.augmentation_rgb_channels,
             num_parallel_calls=tf.data.AUTOTUNE)
        .prefetch(buffer_size=tf.data.AUTOTUNE)
    )

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
        compute_dtype=compute_dtype,
    )
    model.fit(ds_train, epochs=1, verbose=0)
    t0 = time.perf_counter()
    model.fit(ds_train, epochs=EPOCHS - 1, verbose=0)
    dt = time.perf_counter() - t0
    steps = (len(pi) // BATCH) * (EPOCHS - 1)
    return steps * BATCH / dt


def main():
    from ssdseglib_tpu.boxes import Anchors
    from ssdseglib_tpu.config import reference_warehouse_config
    from ssdseglib_tpu.utils.compile_cache import enable_compile_cache

    enable_compile_cache()
    triples = ensure_dataset()
    anchors_cfg, enc_cfg, model_cfg, _, _ = reference_warehouse_config()
    anchors = Anchors.from_config(anchors_cfg, enc_cfg.image_shape)

    rounds = []
    for i in range(2):
        r = (
            native_arm(triples, anchors, enc_cfg, model_cfg),
            compat_arm(triples, anchors, enc_cfg, model_cfg),
            compat_arm(triples, anchors, enc_cfg, model_cfg,
                       compute_dtype="bfloat16"),
        )
        rounds.append(r)
        print(f"round {i}: native-disk {r[0]:.1f} img/s, "
              f"compat-tfdata {r[1]:.1f} img/s, "
              f"compat-bf16 {r[2]:.1f} img/s", flush=True)
    native = max(r[0] for r in rounds)
    compat = max(r[1] for r in rounds)
    compat16 = max(r[2] for r in rounds)
    print(f"\nbest-of-2 (same disk dataset, epochs 2-{EPOCHS}): "
          f"Trainer.fit {native:.1f} img/s | "
          f"compat fit(ds_train) {compat:.1f} img/s | "
          f"compat bf16 {compat16:.1f} img/s -> ratio "
          f"{native / compat:.2f}x "
          f"({'PASS' if native / compat <= 1.2 else 'FAIL'} vs 1.2x target)")


if __name__ == "__main__":
    main()
