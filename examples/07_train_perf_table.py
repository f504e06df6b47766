"""Measured best-config training-step table (VERDICT r2 item 3).

One flagship-config (MobileNetV2 480x640, batch 16, full 3-loss objective
+ streaming metrics) sweep over the training performance knobs:

    f32 -> bf16 compute -> + bf16 Adam-mu -> + remat -> fused-transform

printing device ms/step and img/s for each.  Protocol: data resident on
device, N pipelined steps, one final block_until_ready fence (per-call
fencing measures relay RTT, not device time — docs/PERFORMANCE.md).

Donation (`jax.jit(donate_argnums=(0,))`) is part of the train step itself
(train.py) and therefore on in every row.

Usage: python examples/07_train_perf_table.py [--steps 24] [--batch 16]
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
import numpy as np

from ssdseglib_tpu.boxes import Anchors
from ssdseglib_tpu.config import TrainConfig, reference_warehouse_config
from ssdseglib_tpu.data.pipeline import TrainDataLoader
from ssdseglib_tpu.data.synthetic import generate_dataset
from ssdseglib_tpu.models.builder import SsdSegModel, TrainableModel
from ssdseglib_tpu.train import Trainer


def init_variables_cpu(model_cfg):
    """Init once on CPU (the init program's remote TPU compile costs
    minutes for zero reuse) and share across every config row."""
    model = TrainableModel(module=SsdSegModel(cfg=model_cfg), cfg=model_cfg)
    try:
        with jax.default_device(jax.local_devices(backend="cpu")[0]):
            variables = model.init(jax.random.key(0))
    except RuntimeError:
        variables = model.init(jax.random.key(0))
    return jax.device_put(jax.device_get(variables))


def measure_config(
    name: str,
    train_cfg: TrainConfig,
    model_cfg,
    anchors: Anchors,
    enc_cfg,
    batch: int,
    steps: int,
    fused_transform: bool,
    variables,
    depthwise_impl: str = "conv",
    wgrad_impl: str = "xla",
) -> dict:
    import jax.numpy as jnp

    from ssdseglib_tpu.models import blocks
    from ssdseglib_tpu.train import TrainState

    blocks.set_depthwise_impl(depthwise_impl)
    blocks.set_wgrad_impl(wgrad_impl)
    model = TrainableModel(module=SsdSegModel(cfg=model_cfg), cfg=model_cfg)
    trainer = Trainer(model=model, anchors=anchors, config=train_cfg)
    # fresh buffers per row: the train step donates its state, which would
    # invalidate the shared variables for the following rows
    state = TrainState.create(
        jax.tree_util.tree_map(jnp.copy, variables), trainer.tx
    )

    image_shape = enc_cfg.image_shape
    loader = TrainDataLoader(
        generate_dataset(2 * batch, image_shape=image_shape, seed=3),
        anchors,
        enc_cfg,
        batch_size=batch,
        augmentation_horizontal_flip=True,
        augmentation_rgb=True,
        shuffle=False,
        seed=0,
    )

    if fused_transform:
        step_fn = trainer.fused_train_step_fn(loader.transform)
        raw = [
            (rng, tuple(jax.device_put(a) for a in b))
            for rng, b in loader.iter_raw()
        ]
        jax.block_until_ready(raw)

        def run_step(state, i):
            rng, b = raw[i % len(raw)]
            return step_fn(state, rng, *b)
    else:
        step_fn = trainer.train_step_fn()
        batches = [jax.device_put(b) for b in list(loader)[:2]]
        jax.block_until_ready(batches)

        def run_step(state, i):
            images, targets = batches[i % len(batches)]
            return step_fn(state, images, targets)

    # compile + warmup
    t_compile = time.perf_counter()
    state, metrics = run_step(state, 0)
    jax.block_until_ready(metrics["loss"])
    compile_s = time.perf_counter() - t_compile

    t0 = time.perf_counter()
    for i in range(steps):
        state, metrics = run_step(state, i)
    jax.block_until_ready(metrics["loss"])
    dt = time.perf_counter() - t0

    ms_per_step = 1000.0 * dt / steps
    result = {
        "name": name,
        "ms_per_step": ms_per_step,
        "img_per_s": batch * steps / dt,
        "compile_s": compile_s,
        "loss": float(np.asarray(metrics["loss"])),
    }
    print(
        f"{name:<28} {ms_per_step:8.1f} ms/step  "
        f"{result['img_per_s']:7.1f} img/s  "
        f"(compile {compile_s:.0f}s, loss {result['loss']:.2f})",
        flush=True,
    )
    assert np.isfinite(result["loss"])
    return result


def main() -> None:
    parser = argparse.ArgumentParser()
    parser.add_argument("--steps", type=int, default=24)
    parser.add_argument("--batch", type=int, default=16)
    parser.add_argument("--quick", action="store_true",
                        help="small shapes (CPU smoke)")
    parser.add_argument("--rows", default=None,
                        help="comma-separated name substrings to run "
                             "(default: all rows)")
    args = parser.parse_args()

    anchors_cfg, enc_cfg, model_cfg, _, _ = reference_warehouse_config()
    if args.quick:
        import dataclasses

        from ssdseglib_tpu.config import AnchorsConfig

        anchors_cfg = AnchorsConfig(
            feature_maps_shapes=((6, 8), (3, 4), (2, 2), (1, 1)),
            feature_maps_aspect_ratios=((1.0, 2.0, 0.5),) * 4,
            boxes_scales=(0.2, 0.9),
            centers_padding_from_borders=(0.05,) * 4,
            additional_square_box=True,
        )
        enc_cfg = dataclasses.replace(enc_cfg, image_shape=(96, 128))
        model_cfg = dataclasses.replace(
            model_cfg, input_image_shape=(96, 128, 3), boxes_per_point=(4,) * 4
        )
    anchors = Anchors.from_config(anchors_cfg, enc_cfg.image_shape)

    base = TrainConfig(batch_size=args.batch, learning_rate=1e-4)
    bf16 = TrainConfig(batch_size=args.batch, compute_dtype="bfloat16")
    bf16_mu = TrainConfig(
        batch_size=args.batch, compute_dtype="bfloat16",
        adam_mu_dtype="bfloat16",
    )
    bf16_mu_remat = TrainConfig(
        batch_size=args.batch, compute_dtype="bfloat16",
        adam_mu_dtype="bfloat16", remat=True,
    )
    bf16_loss_only = TrainConfig(
        batch_size=args.batch, compute_dtype="bfloat16",
        streaming_metrics="loss_only",
    )
    rows = [
        ("f32", base, False, "conv", "xla"),
        ("bf16", bf16, False, "conv", "xla"),
        ("bf16 (dot wgrad)", bf16, False, "conv", "dot"),
        ("bf16 + loss-only metrics", bf16_loss_only, False, "conv", "xla"),
        ("bf16 + mu-bf16", bf16_mu, False, "conv", "xla"),
        ("bf16 + mu-bf16 + remat", bf16_mu_remat, False, "conv", "xla"),
        ("bf16 + mu-bf16 (fused xform)", bf16_mu, True, "conv", "xla"),
        ("bf16 + mu-bf16 (dw-shift)", bf16_mu, False, "shift", "xla"),
    ]
    if args.rows:
        wanted = [s.strip() for s in args.rows.split(",")]
        rows = [r for r in rows if any(w in r[0] for w in wanted)]
    print(
        f"train-step sweep: batch {args.batch}, {args.steps} timed steps, "
        f"image {enc_cfg.image_shape}, backend {jax.default_backend()}",
        flush=True,
    )
    variables = init_variables_cpu(model_cfg)
    results = [
        measure_config(
            name, cfg, model_cfg, anchors, enc_cfg, args.batch, args.steps,
            fused, variables, impl, wgrad,
        )
        for name, cfg, fused, impl, wgrad in rows
    ]
    best = min(results, key=lambda r: r["ms_per_step"])
    print(f"\nbest: {best['name']} at {best['ms_per_step']:.1f} ms/step "
          f"({best['img_per_s']:.0f} img/s)")


if __name__ == "__main__":
    main()
