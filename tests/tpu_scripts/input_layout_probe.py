"""Real-TPU probe: does compiling the serving forward with an AUTO input
layout (and device_put-ing batches into the chosen format) remove the
in-program `images` relayout copy (~0.4 ms/batch-16, round-3 profile)?

Run manually on the chip:  python tests/tpu_scripts/input_layout_probe.py
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__)))))

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental.layout import Format, Layout

from ssdseglib_tpu.boxes import Anchors
from ssdseglib_tpu.config import reference_warehouse_config
from ssdseglib_tpu.models.builder import SsdSegModel, TrainableModel
from ssdseglib_tpu.models.fused_inference import make_fused_forward


def timed(fn, inputs, steps=32, rounds=3):
    out = fn(inputs[0])
    jax.block_until_ready(out)
    rates = []
    for _ in range(rounds):
        t0 = time.perf_counter()
        outs = [fn(inputs[i % len(inputs)]) for i in range(steps)]
        # fence by fetching a scalar of the final step: block_until_ready
        # through the relay returns early for some programs
        # (docs/PERFORMANCE.md measurement pitfalls)
        np.asarray(outs[-1]["output-labels"][0, 0])
        dt = time.perf_counter() - t0
        rates.append(1000.0 * dt / steps)
    return sorted(rates)[len(rates) // 2]


def main():
    anchors_cfg, enc_cfg, model_cfg, _, _ = reference_warehouse_config()
    model = TrainableModel(module=SsdSegModel(cfg=model_cfg), cfg=model_cfg)
    with jax.default_device(jax.local_devices(backend="cpu")[0]):
        variables = model.init(jax.random.key(0))
    variables = jax.device_put(jax.device_get(variables))

    fwd = make_fused_forward(model_cfg, variables)
    batch = 16
    base = np.random.default_rng(0).uniform(0, 255, (batch, 480, 640, 3))
    host = [((base + i) % 256.0).astype(np.uint8) for i in range(8)]

    # A: plain jit, default input layout (current serving behavior)
    jfwd = jax.jit(fwd)
    inputs = [jnp.asarray(h) for h in host]
    jax.block_until_ready(inputs)
    ms_default = timed(jfwd, inputs)
    print(f"default layout: {ms_default:.2f} ms/batch", flush=True)

    # B: AUTO input layout, inputs device_put into the compiled format
    auto = Format(Layout.AUTO)
    jauto = jax.jit(fwd, in_shardings=auto)
    compiled = jauto.lower(jax.ShapeDtypeStruct(
        (batch, 480, 640, 3), jnp.uint8)).compile()
    (fmt,), _ = compiled.input_formats
    print("chosen input format:", fmt.layout, flush=True)
    inputs_auto = [jax.device_put(h, fmt) for h in host]
    jax.block_until_ready(inputs_auto)
    ms_auto = timed(compiled, inputs_auto)
    print(f"auto layout:    {ms_auto:.2f} ms/batch", flush=True)


if __name__ == "__main__":
    main()
