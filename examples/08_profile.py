"""Per-op device profile of the serving forward or the train step.

Captures a jax.profiler trace of N steady-state steps on the real TPU,
parses the perfetto trace, and prints device-op time grouped by op name —
the table that drives docs/PERFORMANCE.md's optimization decisions
(round-2/3 per-op tables).

Usage:
    python examples/08_profile.py serve [--steps 8] [--batch 16] [--top 30]
    python examples/08_profile.py train [--steps 8] [--batch 16] [--top 30]
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
import collections
import glob
import gzip
import json
import tempfile

import jax
import jax.numpy as jnp
import numpy as np

from ssdseglib_tpu.boxes import Anchors
from ssdseglib_tpu.config import TrainConfig, reference_warehouse_config
from ssdseglib_tpu.utils.profiling import trace


def _trim_tf_op(tf_op: str, depth: int) -> str:
    """'jit(fused)/transpose(jvp(SsdSegModel))/mask-decoder/conv/...' ->
    'bwd mask-decoder/conv' (direction + first `depth` module segments)."""
    parts = [p for p in tf_op.rstrip(":").split("/") if p]
    if parts and parts[0].startswith("jit("):
        parts = parts[1:]
    direction = "fwd"
    while parts and ("jvp(" in parts[0] or parts[0].startswith("transpose(")):
        if parts[0].startswith("transpose("):
            direction = "bwd"
        parts = parts[1:]
    return f"{direction} " + "/".join(parts[:depth]) if parts else tf_op


def parse_device_ops(log_dir: str, steps: int, depth: int = 2):
    """Sum device-op durations from the newest perfetto trace in log_dir,
    grouped by the XLA op's source module path (`tf_op` metadata) — the
    'XLA Ops' device track only.

    Returns ([(group, total_ms_per_step)], [(category, ms)], total_ms).
    """
    paths = sorted(
        glob.glob(f"{log_dir}/**/*.trace.json.gz", recursive=True),
        key=os.path.getmtime,
    )
    assert paths, f"no trace under {log_dir}"
    with gzip.open(paths[-1], "rt") as f:
        events = json.load(f)["traceEvents"]

    device_pids = set()
    op_tids = set()
    for e in events:
        if e.get("ph") != "M":
            continue
        if e.get("name") == "process_name":
            if "TPU" in e.get("args", {}).get("name", ""):
                device_pids.add(e["pid"])
        elif e.get("name") == "thread_name":
            if e.get("args", {}).get("name") == "XLA Ops":
                op_tids.add((e["pid"], e["tid"]))

    per_group = collections.Counter()
    per_category = collections.Counter()
    for e in events:
        if (
            e.get("ph") == "X"
            and e.get("pid") in device_pids
            and (e["pid"], e.get("tid")) in op_tids
        ):
            args = e.get("args", {})
            group = _trim_tf_op(args.get("tf_op", e.get("name", "?")), depth)
            per_group[group] += e.get("dur", 0)  # microseconds
            per_category[args.get("hlo_category", "?")] += e.get("dur", 0)

    rows = [(g, us / 1000.0 / steps) for g, us in per_group.items()]
    rows.sort(key=lambda r: -r[1])
    cats = [(c, us / 1000.0 / steps) for c, us in per_category.items()]
    cats.sort(key=lambda r: -r[1])
    total = sum(r[1] for r in rows)
    return rows, cats, total


def build_serving(batch: int):
    from ssdseglib_tpu.models import MobileNetV2SsdSegBuilder

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
    try:
        with jax.default_device(jax.local_devices(backend="cpu")[0]):
            variables = model.init(jax.random.key(0))
    except RuntimeError:
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
    base = np.random.default_rng(0).uniform(0, 255, (batch, 480, 640, 3))
    inputs = [
        infer.prepare_input(((base + i) % 256.0).astype(np.uint8))
        for i in range(4)
    ]
    jax.block_until_ready(inputs)

    def step(i):
        return infer(inputs[i % len(inputs)])

    return step


def build_train(batch: int):
    from ssdseglib_tpu.data.pipeline import TrainDataLoader
    from ssdseglib_tpu.data.synthetic import generate_dataset
    from ssdseglib_tpu.models.builder import SsdSegModel, TrainableModel
    from ssdseglib_tpu.train import Trainer, TrainState

    anchors_cfg, enc_cfg, model_cfg, _, _ = reference_warehouse_config()
    anchors = Anchors.from_config(anchors_cfg, enc_cfg.image_shape)
    model = TrainableModel(module=SsdSegModel(cfg=model_cfg), cfg=model_cfg)
    trainer = Trainer(
        model=model,
        anchors=anchors,
        config=TrainConfig(
            batch_size=batch, compute_dtype="bfloat16",
            adam_mu_dtype="bfloat16",
        ),
    )
    # init on CPU: the single-use init program's remote TPU compile costs
    # minutes for zero reuse
    try:
        with jax.default_device(jax.local_devices(backend="cpu")[0]):
            variables = model.init(jax.random.key(0))
    except RuntimeError:
        variables = model.init(jax.random.key(0))
    variables = jax.device_put(jax.device_get(variables))
    state_box = [TrainState.create(variables, trainer.tx)]
    loader = TrainDataLoader(
        generate_dataset(2 * batch, image_shape=enc_cfg.image_shape, seed=3),
        anchors, enc_cfg, batch_size=batch,
        augmentation_horizontal_flip=True, augmentation_rgb=True,
        shuffle=False, seed=0,
    )
    step_fn = trainer.fused_train_step_fn(loader.transform)
    raw = [
        (rng, tuple(jax.device_put(a) for a in b))
        for rng, b in loader.iter_raw()
    ]
    jax.block_until_ready(raw)

    def step(i):
        rng, b = raw[i % len(raw)]
        state_box[0], metrics = step_fn(state_box[0], rng, *b)
        return metrics["loss"]

    return step


def main() -> None:
    parser = argparse.ArgumentParser()
    parser.add_argument("mode", choices=["serve", "train"])
    parser.add_argument("--steps", type=int, default=8)
    parser.add_argument("--batch", type=int, default=16)
    parser.add_argument("--top", type=int, default=30)
    parser.add_argument("--depth", type=int, default=2)
    parser.add_argument("--log-dir", default=None)
    args = parser.parse_args()

    step = build_serving(args.batch) if args.mode == "serve" else build_train(
        args.batch
    )

    # compile + warmup
    out = step(0)
    jax.block_until_ready(out)
    for i in range(3):
        out = step(i)
    jax.block_until_ready(out)

    log_dir = args.log_dir or tempfile.mkdtemp(prefix=f"prof_{args.mode}_")
    with trace(log_dir):
        outs = [step(i) for i in range(args.steps)]
        jax.block_until_ready(outs)

    rows, cats, total = parse_device_ops(log_dir, args.steps, args.depth)
    print(f"\ndevice ops by hlo category, {args.mode} batch {args.batch}, "
          f"per-step ms (total {total:.2f} ms):")
    for name, ms in cats:
        print(f"  {ms:8.3f} ms  {100 * ms / total:5.1f}%  {name}")
    print(f"\ndevice ops by module path (depth {args.depth}):")
    for name, ms in rows[: args.top]:
        print(f"  {ms:8.3f} ms  {100 * ms / total:5.1f}%  {name}")
    print(f"trace: {log_dir}")


if __name__ == "__main__":
    main()
