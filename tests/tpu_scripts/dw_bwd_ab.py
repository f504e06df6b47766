"""Real-TPU A/B: train-step time with DEPTHWISE_BWD_IMPL 'xla' vs 'pallas'
(fused one-pass Pallas dgrad+wgrad for block0-dw), interleaved x2 to
control for the ~5-15%% run-to-run relay drift.
Run: python tests/tpu_scripts/dw_bwd_ab.py
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__)))))

import jax
import jax.numpy as jnp
import numpy as np

from ssdseglib_tpu.boxes import Anchors
from ssdseglib_tpu.config import TrainConfig, reference_warehouse_config
from ssdseglib_tpu.data.pipeline import TrainDataLoader
from ssdseglib_tpu.data.synthetic import generate_dataset
from ssdseglib_tpu.models import blocks
from ssdseglib_tpu.models.builder import SsdSegModel, TrainableModel
from ssdseglib_tpu.train import Trainer, TrainState


def main():
    anchors_cfg, enc_cfg, model_cfg, _, _ = reference_warehouse_config()
    anchors = Anchors.from_config(anchors_cfg, enc_cfg.image_shape)
    batch, steps = 16, 24
    cfg = TrainConfig(batch_size=batch, compute_dtype="bfloat16")

    with jax.default_device(jax.local_devices(backend="cpu")[0]):
        model0 = TrainableModel(module=SsdSegModel(cfg=model_cfg), cfg=model_cfg)
        variables = model0.init(jax.random.key(0))
    variables = jax.device_put(jax.device_get(variables))

    loader = TrainDataLoader(
        generate_dataset(2 * batch, image_shape=enc_cfg.image_shape, seed=3),
        anchors, enc_cfg, batch_size=batch,
        augmentation_horizontal_flip=True, augmentation_rgb=True,
        shuffle=False, seed=0,
    )
    batches = [jax.device_put(b) for b in list(loader)[:2]]
    jax.block_until_ready(batches)

    step_fns = {}

    def measure(impl):
        blocks.set_depthwise_bwd_impl(impl)
        if impl not in step_fns:
            model = TrainableModel(module=SsdSegModel(cfg=model_cfg),
                                   cfg=model_cfg)
            trainer = Trainer(model=model, anchors=anchors, config=cfg)
            step_fns[impl] = (trainer, trainer.train_step_fn())
        trainer, step_fn = step_fns[impl]
        state = TrainState.create(
            jax.tree_util.tree_map(jnp.copy, variables), trainer.tx
        )
        state, m = step_fn(state, *batches[0])
        jax.block_until_ready(m["loss"])
        t0 = time.perf_counter()
        for i in range(steps):
            state, m = step_fn(state, *batches[i % 2])
        jax.block_until_ready(m["loss"])
        ms = 1000.0 * (time.perf_counter() - t0) / steps
        print(f"{impl:6s} {ms:6.1f} ms/step  (loss {float(m['loss']):.2f})",
              flush=True)
        return ms

    rounds = []
    for _ in range(2):
        rounds.append((measure("xla"), measure("pallas")))
    xla = min(r[0] for r in rounds)
    pal = min(r[1] for r in rounds)
    print(f"\nbest-of-2: xla {xla:.1f}  pallas {pal:.1f}  "
          f"({100 * (xla - pal) / xla:+.1f}% change)")


if __name__ == "__main__":
    main()
