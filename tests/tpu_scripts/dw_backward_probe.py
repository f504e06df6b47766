"""Real-TPU probe: Pallas fused depthwise-3x3 backward vs XLA's vjp.

Targets the round-3 train-profile rows `bwd block0-depthwise` (4.08 ms,
16x240x320x32) and `bwd block2-depthwise` (1.8 ms, 16x120x160x144): both
stride-1 SAME 3x3 depthwise backwards that XLA runs as three lane-padded
passes (see ops/depthwise_backward.py docstring).

R repeats inside ONE jit with distinct operand slices (standalone dispatch
is launch-bound through the relay — CLAUDE.md gotchas), fetch-fenced, and
a bf16 parity check against XLA's own vjp first.

Run: python tests/tpu_scripts/dw_backward_probe.py
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__)))))

import jax
import jax.numpy as jnp
import numpy as np

from ssdseglib_tpu.ops.depthwise_backward import depthwise3x3_backward

R = 8


def conv(x, k):
    c = x.shape[-1]
    return jax.lax.conv_general_dilated(
        x, k, (1, 1), "SAME",
        dimension_numbers=("NHWC", "HWIO", "NHWC"), feature_group_count=c)


def xla_bwd(x, dy, k):
    _, pull = jax.vjp(conv, x, k)
    return pull(dy)


def make_timed(bwd):
    def f(xs, dys, k):
        outs = []
        for i in range(R):
            dx, dk = bwd(xs[i], dys[i], k)
            outs.append(jnp.sum(dx[:, ::32, ::32].astype(jnp.float32))
                        + jnp.sum(dk.astype(jnp.float32)))
        return jnp.stack(outs)
    return jax.jit(f)


def timed(f, xs, dys, k, steps=8):
    out = f(xs, dys, k)
    np.asarray(out)
    t0 = time.perf_counter()
    for _ in range(steps):
        out = f(xs, dys, k)
    np.asarray(out)
    return 1000.0 * (time.perf_counter() - t0) / (steps * R)


def main():
    rng = np.random.default_rng(0)
    B = 16
    dtype = jnp.bfloat16
    cases = [
        ("block0-dw 32 @240x320", 240, 320, 32),
        ("block2-dw 144 @120x160", 120, 160, 144),
    ]
    for name, H, W, C in cases:
        x1 = jnp.asarray(rng.standard_normal((B, H, W, C)), dtype)
        dy1 = jnp.asarray(rng.standard_normal((B, H, W, C)), dtype)
        k = jnp.asarray(rng.standard_normal((3, 3, 1, C)) * 0.3, dtype)

        # parity (bf16 operands, f32 accumulation both sides)
        dx_r, dk_r = jax.jit(xla_bwd)(x1, dy1, k)
        dx_p, dk_p = depthwise3x3_backward(x1, dy1, k)
        dxe = float(jnp.abs(dx_p.astype(jnp.float32)
                            - dx_r.astype(jnp.float32)).max())
        dke = float(jnp.abs(dk_p.astype(jnp.float32)
                            - dk_r.astype(jnp.float32)).max()
                    / max(1e-6, float(jnp.abs(dk_r).max())))
        print(f"{name:26s} parity dx {dxe:.2e}  dk(rel) {dke:.2e}",
              flush=True)

        xs = jnp.asarray(rng.standard_normal((R, B, H, W, C)), dtype)
        dys = jnp.asarray(rng.standard_normal((R, B, H, W, C)), dtype)
        ms_xla = timed(make_timed(xla_bwd), xs, dys, k)
        ms_pal = timed(make_timed(
            lambda x, dy, kk: depthwise3x3_backward(x, dy, kk)), xs, dys, k)
        print(f"{name:26s} xla {ms_xla:6.3f} ms   pallas {ms_pal:6.3f} ms "
              f"({ms_xla / ms_pal:.2f}x)", flush=True)


if __name__ == "__main__":
    main()
