"""Real-TPU probe: feature-major (NCHW) layout for the early-layer
train step section vs the framework's NHWC.

Hypothesis (seventh study on the ~15 ms early-backward frontier): with
NHWC, the C=16..96 early tensors put a lane-padded channel dim in lanes
(C=32 -> 128 pads 4x), and six prior studies showed the backward cost is
exactly this padded-bandwidth.  Feature-major puts W (240-320, fully
packed) in lanes instead.  If XLA:TPU honors the logical NCHW layout for
conv + BN + ReLU6 chains rather than transposing back to its preferred
internal form, the early fwd+bwd should get cheaper; if it inserts
transposes per conv, it will lose big (like the dw-shift study).

Stack probed (the profile's hottest early rows, 16x240x320 @ bf16):
  dw3x3(32) + BN + ReLU6 -> 1x1 32->16 + BN -> 1x1 16->96 + BN + ReLU6
forward + full backward (input + all weight grads).

Run: python tests/tpu_scripts/nchw_early_probe.py
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__)))))

import jax
import jax.numpy as jnp
import numpy as np

R = 6
B, H, W = 16, 240, 320
C0, C1, C2 = 32, 16, 96
EPS = 1e-3


def stack_nhwc(x, params):
    kdw, g0, b0, kp, g1, b1, ke, g2, b2 = params

    def bn_relu6(y, g, b, relu):
        mu = y.mean(axis=(0, 1, 2), keepdims=True)
        var = ((y - mu) ** 2).mean(axis=(0, 1, 2), keepdims=True)
        y = (y - mu) * jax.lax.rsqrt(var + EPS) * g + b
        return jnp.clip(y, 0.0, 6.0) if relu else y

    y = jax.lax.conv_general_dilated(
        x, kdw, (1, 1), "SAME",
        dimension_numbers=("NHWC", "HWIO", "NHWC"), feature_group_count=C0)
    y = bn_relu6(y, g0, b0, True)
    y = jax.lax.conv_general_dilated(
        y, kp, (1, 1), "SAME", dimension_numbers=("NHWC", "HWIO", "NHWC"))
    y = bn_relu6(y, g1, b1, False)
    y = jax.lax.conv_general_dilated(
        y, ke, (1, 1), "SAME", dimension_numbers=("NHWC", "HWIO", "NHWC"))
    y = bn_relu6(y, g2, b2, True)
    return y


def stack_nchw(x, params):
    kdw, g0, b0, kp, g1, b1, ke, g2, b2 = params
    # kernels stay HWIO-shaped; reshape BN vectors to (1, C, 1, 1)
    def bn_relu6(y, g, b, relu):
        g = g.reshape(1, -1, 1, 1)
        b = b.reshape(1, -1, 1, 1)
        mu = y.mean(axis=(0, 2, 3), keepdims=True)
        var = ((y - mu) ** 2).mean(axis=(0, 2, 3), keepdims=True)
        y = (y - mu) * jax.lax.rsqrt(var + EPS) * g + b
        return jnp.clip(y, 0.0, 6.0) if relu else y

    y = jax.lax.conv_general_dilated(
        x, kdw, (1, 1), "SAME",
        dimension_numbers=("NCHW", "HWIO", "NCHW"), feature_group_count=C0)
    y = bn_relu6(y, g0, b0, True)
    y = jax.lax.conv_general_dilated(
        y, kp, (1, 1), "SAME", dimension_numbers=("NCHW", "HWIO", "NCHW"))
    y = bn_relu6(y, g1, b1, False)
    y = jax.lax.conv_general_dilated(
        y, ke, (1, 1), "SAME", dimension_numbers=("NCHW", "HWIO", "NCHW"))
    y = bn_relu6(y, g2, b2, True)
    return y


def make_timed(stack):
    def loss(x, params):
        return jnp.sum(stack(x, params).astype(jnp.float32) ** 2)

    grad = jax.grad(loss, argnums=(0, 1))

    def f(xs, params):
        outs = []
        for i in range(R):
            dx, dps = grad(xs[i], params)
            s = jnp.sum(dx[:, ::16, ::16].astype(jnp.float32))
            for dp in jax.tree_util.tree_leaves(dps):
                s = s + jnp.sum(dp.astype(jnp.float32))
            outs.append(s)
        return jnp.stack(outs)

    return jax.jit(f)


def timed(f, xs, params, steps=8):
    out = f(xs, params)
    np.asarray(out)
    times = []
    for _ in range(steps):
        t0 = time.perf_counter()
        out = f(xs, params)
        np.asarray(out)
        times.append(time.perf_counter() - t0)
    return min(times) / R


def main():
    rng = np.random.default_rng(0)
    dt = jnp.bfloat16
    params = [
        jnp.asarray(rng.normal(0, 0.1, (3, 3, 1, C0)), dt),   # kdw HWIO
        jnp.asarray(rng.uniform(0.5, 1.5, C0), dt),
        jnp.asarray(rng.normal(0, 0.1, C0), dt),
        jnp.asarray(rng.normal(0, 0.1, (1, 1, C0, C1)), dt),  # kp
        jnp.asarray(rng.uniform(0.5, 1.5, C1), dt),
        jnp.asarray(rng.normal(0, 0.1, C1), dt),
        jnp.asarray(rng.normal(0, 0.1, (1, 1, C1, C2)), dt),  # ke
        jnp.asarray(rng.uniform(0.5, 1.5, C2), dt),
        jnp.asarray(rng.normal(0, 0.1, C2), dt),
    ]
    xs_nhwc = jnp.asarray(
        rng.normal(0, 1, (R, B, H, W, C0)), dt)
    xs_nchw = jnp.transpose(xs_nhwc, (0, 1, 4, 2, 3))  # (R, B, C, H, W)

    f_nhwc = make_timed(stack_nhwc)
    f_nchw = make_timed(stack_nchw)

    # numerical sanity: same loss-ish outputs between layouts (bf16 tol)
    y0 = np.asarray(f_nhwc(xs_nhwc, params))
    y1 = np.asarray(f_nchw(xs_nchw, params))
    rel = np.abs(y0 - y1) / (np.abs(y0) + 1e-3)
    print(f"parity rel err (grad sums): {rel.max():.2e}")

    t_nhwc = timed(f_nhwc, xs_nhwc, params)
    t_nchw = timed(f_nchw, xs_nchw, params)
    print(f"NHWC fwd+bwd: {t_nhwc * 1e3:.2f} ms/chain")
    print(f"NCHW fwd+bwd: {t_nchw * 1e3:.2f} ms/chain "
          f"({t_nhwc / t_nchw:.2f}x)")


if __name__ == "__main__":
    main()
