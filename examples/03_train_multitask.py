"""Multi-task training — script equivalent of reference notebook
`03-multi-task-network-ssdlite-deeplabv3plus-training.ipynb`.

Reproduces the published recipe (cells 2/6/12/14/16): seed 1993, 480x640,
batch 16, Adam 1e-4, CE mask weights (0.05, 0.575, 0.135, 0.24), dilation
rates (3, 6, 12), 9600 default boxes, IoU threshold 0.525 — then evaluates
mAP@{0.5,0.6,0.7} and soft mIoU with the reference-quirk-compatible
evaluators and runs the NMS operating point (iou 0.025, prob 0.725).

The proprietary warehouse images are absent from the reference mount, so
this driver defaults to synthetic scenes; point `--data` at a directory of
[image.png, mask.png, labels.csv] triples (reference data/*.json format) to
train on real data (decoded by the native C++ loader).

Run:  python examples/03_train_multitask.py --epochs 2 --train-samples 64
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# persistent XLA compile cache: fresh processes reuse compiled
# programs (20-40 s/program on this relay) — utils/compile_cache.py
from ssdseglib_tpu.utils.compile_cache import enable_compile_cache

enable_compile_cache()

import argparse
import json

import jax
import numpy as np

from ssdseglib_tpu import evaluators
from ssdseglib_tpu.boxes import Anchors
from ssdseglib_tpu.checkpoint import Checkpointer
from ssdseglib_tpu.config import reference_warehouse_config, TrainConfig
from ssdseglib_tpu.data.pipeline import TrainDataLoader, load_dataset_json
from ssdseglib_tpu.data.synthetic import generate_dataset
from ssdseglib_tpu.models import MobileNetV2SsdSegBuilder
from ssdseglib_tpu.parallel import mesh as mesh_lib
from ssdseglib_tpu.train import Trainer


def main() -> None:
    parser = argparse.ArgumentParser()
    parser.add_argument("--epochs", type=int, default=2)
    parser.add_argument("--batch-size", type=int, default=16)
    parser.add_argument("--train-samples", type=int, default=64)
    parser.add_argument("--eval-samples", type=int, default=16)
    parser.add_argument("--data", type=str, default=None,
                        help="dataset JSON (list of path triples)")
    parser.add_argument("--checkpoint-dir", type=str, default=None)
    parser.add_argument("--data-parallel", action="store_true")
    parser.add_argument("--bf16", action="store_true",
                        help="mixed-precision training + bf16 fused serving")
    parser.add_argument("--learning-rate", type=float, default=1e-4)
    args = parser.parse_args()

    anchors_cfg, enc_cfg, model_cfg, nms_cfg, _ = reference_warehouse_config()
    train_cfg = TrainConfig(
        batch_size=args.batch_size, epochs=args.epochs, seed=1993,
        learning_rate=args.learning_rate,
        compute_dtype="bfloat16" if args.bf16 else "float32",
    )
    anchors = Anchors.from_config(anchors_cfg, enc_cfg.image_shape)

    # data
    if args.data:
        if not os.path.exists(args.data):
            parser.error(f"--data file not found: {args.data}")
        triples = load_dataset_json(args.data)
        train_samples = triples[: -args.eval_samples]
        eval_samples = triples[-args.eval_samples:]
    else:
        print("no --data given: using synthetic warehouse scenes")
        train_samples = generate_dataset(
            args.train_samples, image_shape=enc_cfg.image_shape, seed=1993
        )
        eval_samples = generate_dataset(
            args.eval_samples, image_shape=enc_cfg.image_shape, seed=2024
        )

    loader = TrainDataLoader(
        train_samples, anchors, enc_cfg, batch_size=train_cfg.batch_size,
        augmentation_horizontal_flip=True, augmentation_rgb=True,
        seed=train_cfg.seed,
    )
    eval_loader = TrainDataLoader(
        eval_samples, anchors, enc_cfg, batch_size=train_cfg.batch_size,
        shuffle=False,
    )

    # model + trainer (published architecture config)
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
        segmentation_architecture="deeplabv3plus",
        object_detection_architecture="ssdlite",
        segmentation_dilation_rates=model_cfg.segmentation_dilation_rates,
    )
    trainer = Trainer(
        model=model, anchors=anchors, config=train_cfg,
        standard_deviations=enc_cfg.standard_deviations,
    )

    mesh = mesh_lib.make_mesh() if args.data_parallel else None
    state = trainer.init_state(jax.random.key(train_cfg.seed), mesh=mesh)
    trainable, stats = model.parameter_counts(state.variables())
    print(f"params: {trainable + stats:,} total / {trainable:,} trainable")

    ckpt = Checkpointer(args.checkpoint_dir) if args.checkpoint_dir else None
    state, history = trainer.fit(
        state, loader, epochs=train_cfg.epochs,
        validation_data=eval_loader, mesh=mesh, checkpointer=ckpt,
    )

    # inference model (published NMS operating point, notebook 03 cell 23)
    inference = builder.get_model_for_inference(
        model_trained=jax.device_get(state.variables()),
        max_number_of_boxes_per_class=nms_cfg.max_boxes_per_class,
        max_number_of_boxes_per_sample=nms_cfg.max_boxes_per_sample,
        boxes_iou_threshold=nms_cfg.iou_threshold,
        labels_probability_threshold=nms_cfg.score_threshold,
        suppress_background_boxes=nms_cfg.suppress_background_boxes,
        use_segmentation_suppression=nms_cfg.use_segmentation_suppression,
        compute_dtype="bfloat16" if args.bf16 else "float32",
        fused_backbone=args.bf16,
    )

    # evaluation (reference notebook 03 cells 25-29)
    masks_pred, detections, gt_boxes, gt_masks = [], [], [], []
    for images, masks, gl, gb, gv in eval_loader.batcher:
        mask, det = inference.predict(images.astype(np.float32))
        masks_pred.append(mask)
        detections.append(det)
        for i in range(len(images)):
            n = int(gv[i].sum())
            gt_boxes.append((gl[i][:n], gb[i][:n]))
            gt_masks.append(masks[i])
    masks_pred = np.concatenate(masks_pred)
    detections = np.concatenate(detections)

    labels_pred = detections[:, :, 0].astype(np.int32)
    conf_pred = detections[:, :, 1]
    boxes_pred = detections[:, :, 2:]

    print("\nevaluation:")
    for thr in (0.5, 0.6, 0.7):
        ap = evaluators.average_precision_object_detection(
            labels_pred, conf_pred, boxes_pred, thr, gt_boxes,
            labels_codes=[0, 1, 2, 3], label_code_background=0,
        )
        print(f"  mAP@{thr}: {np.mean(list(ap.values())):.4f}  per-class {ap}")
    iou = evaluators.jaccard_iou_semantic_segmentation(
        masks_pred, gt_masks, labels_codes=[0, 1, 2, 3], label_code_background=0
    )
    print(f"  mIoU: {np.mean(list(iou.values())):.4f}  per-class {iou}")

    print(json.dumps({k: v[-1] for k, v in history.items()}, indent=2))


if __name__ == "__main__":
    main()
