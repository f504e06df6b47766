"""Real-TPU probe: decompose the early-layer conv backward cost.

The round-3 train profile (docs/PERFORMANCE.md) shows ~15 ms/step of the
59 ms bf16 train step in the backward of the stem/block0/block1 convs —
tiny-channel (3-96) convolutions at 240x320-480x640 whose weight
gradients are tiny-output giant-K contractions (e.g. (32, 16) reduced
over 1.23M positions) that XLA lowers ~100-300x off the HBM roofline.

For each hot shape this measures, separately:
  - fwd conv
  - dgrad (grad w.r.t. the input, wgrad cost excluded)
  - wgrad (grad w.r.t. the kernel, dgrad cost excluded)
  - wgrad reformulated as a reshape + dot_general (1x1 convs) or as
    9 shifted multiply-reduces (3x3 depthwise)

to decide whether the fix is a reformulation (plain XLA) or a Pallas
accumulation kernel.  Run manually: python tests/tpu_scripts/wgrad_probe.py
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__)))))

import jax
import jax.numpy as jnp
import numpy as np


def timed(fn, args_list, steps=16, rounds=3):
    out = fn(*args_list[0])
    jax.block_until_ready(out)
    rates = []
    for _ in range(rounds):
        t0 = time.perf_counter()
        outs = [fn(*args_list[i % len(args_list)]) for i in range(steps)]
        jax.block_until_ready(outs)
        rates.append(1000.0 * (time.perf_counter() - t0) / steps)
    return sorted(rates)[len(rates) // 2]


def conv(x, w, stride, depthwise):
    groups = x.shape[-1] if depthwise else 1
    return jax.lax.conv_general_dilated(
        x, w, (stride, stride), "SAME",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        feature_group_count=groups,
    )


def main():
    B = 16
    dtype = jnp.bfloat16
    rng = np.random.default_rng(0)
    # (name, H, W, Cin, Cout, k, stride, depthwise)
    cases = [
        ("block0-expand 3->32 s2", 480, 640, 3, 32, 3, 2, False),
        ("block0-depthwise 32 @240x320", 240, 320, 32, 32, 3, 1, True),
        ("block0-project 32->16 1x1", 240, 320, 32, 16, 1, 1, False),
        ("block1-expand 16->96 1x1", 240, 320, 16, 96, 1, 1, False),
        ("block1-depthwise 96 s2", 240, 320, 96, 96, 3, 2, True),
    ]
    for name, H, W, Cin, Cout, k, stride, dw in cases:
        kin = 1 if dw else Cin
        Ho, Wo = -(-H // stride), -(-W // stride)
        xs = [jnp.asarray(rng.standard_normal((B, H, W, Cin)), dtype)
              for _ in range(4)]
        dys = [jnp.asarray(rng.standard_normal((B, Ho, Wo, Cout)), dtype)
               for _ in range(4)]
        w = jnp.asarray(rng.standard_normal((k, k, kin, Cout)) * 0.1, dtype)

        fwd = jax.jit(lambda x: conv(x, w, stride, dw))
        ms_fwd = timed(fwd, [(x,) for x in xs])

        def vjp_dgrad(x, dy):
            _, pull = jax.vjp(lambda x_: conv(x_, w, stride, dw), x)
            return pull(dy)[0]

        def vjp_wgrad(x, dy):
            _, pull = jax.vjp(lambda w_: conv(x, w_, stride, dw), w)
            return pull(dy)[0]

        ms_d = timed(jax.jit(vjp_dgrad), list(zip(xs, dys)))
        ms_w = timed(jax.jit(vjp_wgrad), list(zip(xs, dys)))
        line = (f"{name:34s} fwd {ms_fwd:6.2f}  dgrad {ms_d:6.2f}  "
                f"wgrad {ms_w:6.2f}")

        if k == 1 and not dw:
            def wgrad_dot(x, dy):
                xm = x.reshape(-1, Cin)
                dym = dy.reshape(-1, Cout)
                return jax.lax.dot_general(
                    xm, dym, (((0,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32,
                )[None, None].astype(dtype)

            ms_r = timed(jax.jit(wgrad_dot), list(zip(xs, dys)))
            line += f"  wgrad-dot {ms_r:6.2f}"
        if dw and stride == 1:
            pad = k // 2

            def wgrad_shift(x, dy):
                xp = jnp.pad(x, ((0, 0), (pad, pad), (pad, pad), (0, 0)))
                taps = []
                for dh in range(k):
                    for dwi in range(k):
                        sl = xp[:, dh:dh + H, dwi:dwi + W, :]
                        taps.append(
                            jnp.sum((sl * dy).astype(jnp.float32),
                                    axis=(0, 1, 2))
                        )
                return jnp.stack(taps).reshape(k, k, Cin, 1).astype(dtype)

            ms_r = timed(jax.jit(wgrad_shift), list(zip(xs, dys)))
            line += f"  wgrad-shift {ms_r:6.2f}"
        print(line, flush=True)


if __name__ == "__main__":
    main()
