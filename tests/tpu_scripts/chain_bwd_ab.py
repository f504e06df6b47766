"""Real-TPU A/B: train-step time with CHAIN_BWD_IMPL 'xla' vs 'pallas'
(whole-chain fused Pallas backward for block0's dw3x3+BN+ReLU6 unit —
ops/fused_chain_backward.py, VERDICT r3 item 1), interleaved x2 to
control for the ~5-15% run-to-run relay drift.  Also reports a
standalone (isolated-unit) comparison so the e2e delta can be attributed.
Run: python tests/tpu_scripts/chain_bwd_ab.py
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
from ssdseglib_tpu.utils.compile_cache import enable_compile_cache


def standalone():
    """Isolated block0-chain backward: XLA vjp vs the fused kernel, in-jit
    repeats (the standalone shape from the round-3 study: 16x240x320x32)."""
    from ssdseglib_tpu.ops.fused_chain_backward import (
        dw_bn_relu6_backward,
        dw_bn_relu6_chain,
    )

    b, h, w, c = 16, 240, 320, 32
    key = jax.random.key(0)
    dt = jnp.bfloat16
    x = jax.random.normal(key, (b, h, w, c), dt)
    kernel = (jax.random.normal(jax.random.key(1), (3, 3, 1, c)) * 0.3).astype(dt)
    gamma = jnp.ones((c,), dt)
    beta = jnp.zeros((c,), dt)
    dy = jax.random.normal(jax.random.key(2), (b, h, w, c), dt)

    def plain(x, kernel, gamma, beta):
        u = jax.lax.conv_general_dilated(
            x, kernel, (1, 1), "SAME",
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            feature_group_count=c,
        )
        u32 = u.astype(jnp.float32)
        mean = jnp.mean(u32, axis=(0, 1, 2))
        var = jnp.maximum(
            jnp.mean(u32 * u32, axis=(0, 1, 2)) - mean * mean, 0.0
        )
        inv = jax.lax.rsqrt(var + 1e-3)
        z = ((u32 - mean) * (inv * gamma.astype(jnp.float32))
             + beta.astype(jnp.float32)).astype(u.dtype)
        return jnp.minimum(jax.nn.relu(z), jnp.array(6, z.dtype))

    reps = 20

    @jax.jit
    def bwd_xla(x, kernel, gamma, beta, dy):
        out = 0.0
        for i in range(reps):
            _, vjp = jax.vjp(plain, x + i * 1e-6, kernel, gamma, beta)
            gs = vjp(dy)
            out = out + sum(jnp.sum(g.astype(jnp.float32)) for g in gs)
        return out

    @jax.jit
    def bwd_pallas(x, kernel, gamma, beta, dy):
        out = 0.0
        for i in range(reps):
            xi = x + i * 1e-6
            _, vjp = jax.vjp(
                lambda a, k, g, b: dw_bn_relu6_chain(a, k, g, b)[0],
                xi, kernel, gamma, beta,
            )
            gs = vjp(dy)
            out = out + sum(jnp.sum(g.astype(jnp.float32)) for g in gs)
        return out

    for name, fn in (("xla", bwd_xla), ("pallas", bwd_pallas)):
        # fence by FETCHING (block_until_ready returns early for some
        # programs through the relay — CLAUDE.md measurement gotchas)
        np.asarray(fn(x, kernel, gamma, beta, dy))
        t0 = time.perf_counter()
        np.asarray(fn(x, kernel, gamma, beta, dy))
        ms = 1000.0 * (time.perf_counter() - t0) / reps
        print(f"standalone chain bwd {name:6s} {ms:6.2f} ms", flush=True)


def main():
    enable_compile_cache()
    standalone()

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
        blocks.set_chain_bwd_impl(impl)
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
        blocks.set_chain_bwd_impl("xla")
        return ms

    rounds = []
    for _ in range(2):
        rounds.append((measure("xla"), measure("pallas")))
    xla = min(r[0] for r in rounds)
    pal = min(r[1] for r in rounds)
    print(f"\nbest-of-2: xla {xla:.1f}  pallas-chain {pal:.1f}  "
          f"({100 * (xla - pal) / xla:+.1f}% change)")


if __name__ == "__main__":
    main()
