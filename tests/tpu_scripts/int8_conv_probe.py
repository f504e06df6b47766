"""Real-TPU probe: does XLA lower int8 convolutions onto the v5e MXU at
the expected ~2x bf16 rate?

Feasibility gate for an int8 (weight+activation) quantized serving path:
the serving program is convolution-bound (72.7% of 10.84 ms, round-3
profile) with the mask-decoder convs at bf16 MXU peak, so int8 is the
only remaining >1.2x lever.  Measures the three dominant conv shapes,
R repeats inside ONE jit (standalone dispatch is launch-bound through the
relay — CLAUDE.md gotchas), fetch-fenced.

Run: python tests/tpu_scripts/int8_conv_probe.py
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__)))))

import jax
import jax.numpy as jnp
import numpy as np

R = 8  # conv applications per jit call, distinct input slices


def conv_fn(dtype, acc_dtype, k, stride):
    def f(xs, w):
        outs = []
        for i in range(R):
            y = jax.lax.conv_general_dilated(
                xs[i], w, (stride, stride), "SAME",
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
                preferred_element_type=acc_dtype,
            )
            outs.append(jnp.sum(y[:, ::16, ::16].astype(jnp.float32)))
        return jnp.stack(outs)

    return jax.jit(f)


def timed(f, xs, w, steps=8):
    out = f(xs, w)
    np.asarray(out)
    t0 = time.perf_counter()
    for _ in range(steps):
        out = f(xs, w)
    np.asarray(out)
    return 1000.0 * (time.perf_counter() - t0) / (steps * R)


def main():
    rng = np.random.default_rng(0)
    B = 16
    cases = [
        ("mask-decoder 3x3 304->256 @120x160", 120, 160, 304, 256, 3, 1),
        ("aspp-pointwise 1x1 576->256 @30x40", 30, 40, 576, 256, 1, 1),
        ("decoder sepconv-pw 1x1 256->256 @120x160", 120, 160, 256, 256, 1, 1),
    ]
    for name, H, W, Ci, Co, k, s in cases:
        x8 = rng.integers(-127, 127, (R, B, H, W, Ci), dtype=np.int8)
        w8 = rng.integers(-127, 127, (k, k, Ci, Co), dtype=np.int8)
        xb = jnp.asarray(x8, jnp.bfloat16)
        wb = jnp.asarray(w8, jnp.bfloat16)

        ms_bf16 = timed(conv_fn(jnp.bfloat16, jnp.float32, k, s),
                        xb, wb)
        try:
            ms_int8 = timed(conv_fn(jnp.int8, jnp.int32, k, s),
                            jnp.asarray(x8), jnp.asarray(w8))
            msg = f"int8 {ms_int8:6.3f} ms  ({ms_bf16 / ms_int8:.2f}x)"
        except Exception as e:  # noqa: BLE001 — report and continue
            msg = f"int8 FAILED: {type(e).__name__}: {str(e)[:120]}"
        print(f"{name:42s} bf16 {ms_bf16:6.3f} ms  {msg}", flush=True)


if __name__ == "__main__":
    main()
