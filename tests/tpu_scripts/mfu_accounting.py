"""FLOPs-derived MFU accounting for the serving and training steps
(VERDICT r3 item 8): pulls the EXACT flop count of the compiled programs
from XLA's own cost model (`compiled.cost_analysis()['flops']`) so the
docs/PERFORMANCE.md "at MXU peak" claims are externally checkable.

MFU = (program flops / measured step seconds) / chip peak.
v5e bf16 peak: 197 TFLOP/s (f32: 98.5).

Run: python tests/tpu_scripts/mfu_accounting.py
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__)))))

import jax
import jax.numpy as jnp
import numpy as np

from ssdseglib_tpu.boxes import Anchors
from ssdseglib_tpu.config import TrainConfig, reference_warehouse_config
from ssdseglib_tpu.models.builder import SsdSegModel, TrainableModel
from ssdseglib_tpu.train import Trainer, TrainState
from ssdseglib_tpu.utils.compile_cache import enable_compile_cache

PEAK_BF16 = 197e12  # v5e


def flops_of(jitted, *args) -> float:
    compiled = jitted.lower(*args).compile()
    analyses = compiled.cost_analysis()
    a = analyses[0] if isinstance(analyses, (list, tuple)) else analyses
    return float(a["flops"])


def main():
    enable_compile_cache()
    anchors_cfg, enc_cfg, model_cfg, _, _ = reference_warehouse_config()
    anchors = Anchors.from_config(anchors_cfg, enc_cfg.image_shape)
    batch = 16
    h, w = enc_cfg.image_shape

    module = SsdSegModel(cfg=model_cfg)
    with jax.default_device(jax.local_devices(backend="cpu")[0]):
        variables = module.init(
            jax.random.key(0), jnp.zeros((1, h, w, 3)), train=False
        )

    # serving forward (bf16 compute dtype, like the bench path)
    bf16_vars = jax.tree_util.tree_map(
        lambda x: x.astype(jnp.bfloat16), variables
    )

    def forward(v, images):
        return module.apply(v, images.astype(jnp.bfloat16), train=False)

    fwd_flops = flops_of(
        jax.jit(forward), bf16_vars,
        jax.ShapeDtypeStruct((batch, h, w, 3), jnp.float32),
    )

    # full training step (bf16 compute, the examples/07 configuration)
    model = TrainableModel(module=module, cfg=model_cfg)
    trainer = Trainer(
        model=model, anchors=anchors,
        config=TrainConfig(batch_size=batch, compute_dtype="bfloat16"),
    )
    state = TrainState.create(variables, trainer.tx)
    n_anchors = anchors.total_boxes
    targets = {
        "output-mask": jax.ShapeDtypeStruct((batch, h, w, 4), jnp.float32),
        "output-labels": jax.ShapeDtypeStruct(
            (batch, n_anchors, 4), jnp.float32
        ),
        "output-boxes": jax.ShapeDtypeStruct(
            (batch, n_anchors, 4), jnp.float32
        ),
    }
    train_flops = flops_of(
        trainer.train_step_fn(), state,
        jax.ShapeDtypeStruct((batch, h, w, 3), jnp.float32), targets,
    )

    serve_ms, train_ms = 10.36, 58.9  # measured device times (PERFORMANCE.md)
    print(f"serving forward: {fwd_flops / 1e9:.1f} GFLOP/batch-16 "
          f"({fwd_flops / batch / 1e9:.1f}/image) -> "
          f"{fwd_flops / (serve_ms / 1e3) / 1e12:.1f} TFLOP/s at "
          f"{serve_ms} ms = {fwd_flops / (serve_ms / 1e3) / PEAK_BF16:.1%} MFU")
    print(f"train step:      {train_flops / 1e9:.1f} GFLOP/batch-16 -> "
          f"{train_flops / (train_ms / 1e3) / 1e12:.1f} TFLOP/s at "
          f"{train_ms} ms = "
          f"{train_flops / (train_ms / 1e3) / PEAK_BF16:.1%} MFU")


if __name__ == "__main__":
    main()
