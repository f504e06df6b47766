"""Shift-multiply depthwise convolution (VPU formulation).

A depthwise KxK conv does K*K multiply-accumulates per element — vector
work, not matrix work.  XLA lowers `conv_general_dilated` with
`feature_group_count=C` through the convolution unit, which the round-3
train profile shows running 4-6x off bandwidth-bound on the big-spatial
early MobileNetV2 blocks, with the backward pass (a [3,3,1,C] weight-grad
"matmul" with M=9, N=C, K=B*H*W) worst of all (examples/08_profile.py:
bwd block0-depthwise 4.1 ms vs 1.0 ms forward at 16x240x320x32).

This formulation replaces the conv op with K*K shifted elementwise
multiply-adds.  XLA fuses the taps into a single loop fusion that reads
the input once, so forward traffic is ~(read x + write y); autodiff of
the formulation yields the same shifted-multiply structure for the input
grad and plain multiply-reduce fusions for the weight grad — no
degenerate-MXU ops anywhere.

Numerics: products and tap accumulation in f32 (matching the conv unit's
f32 accumulator for bf16 inputs), output cast back to the input dtype.
Identical SAME/VALID geometry to `lax.conv_general_dilated`.

MEASURED OUTCOME (v5e, round 3): the shift formulation LOSES end-to-end —
157 vs 59 ms/step for the bf16 train config (examples/07_train_perf_table).
XLA's conv lowering wins despite the per-op profile suggesting headroom;
kept as a parity-tested opt-in (`models.blocks.set_depthwise_impl`)
negative result, same policy as the round-2 s2d stem study.
"""

from __future__ import annotations

from typing import Tuple

import jax.numpy as jnp
from jax import lax


def _same_pads(size: int, stride: int, eff_k: int) -> Tuple[int, int]:
    out = -(-size // stride)  # ceil
    pad = max((out - 1) * stride + eff_k - size, 0)
    return pad // 2, pad - pad // 2


def depthwise_conv_shift(
    x: jnp.ndarray,
    kernel: jnp.ndarray,
    strides: Tuple[int, int] = (1, 1),
    dilation: Tuple[int, int] = (1, 1),
    padding: str = "SAME",
) -> jnp.ndarray:
    """Depthwise conv as K*K shifted multiply-adds.

    Args:
        x: (B, H, W, C)
        kernel: (kh, kw, 1, C) — the HWIO layout `flax.linen.Conv` stores
            for `feature_group_count=C`
        padding: 'SAME' (TF geometry) or 'VALID'
    Returns:
        (B, out_h, out_w, C), dtype of x.
    """
    kh, kw, _, c = kernel.shape
    assert x.shape[-1] == c, (x.shape, kernel.shape)
    sh, sw = strides
    dh, dw = dilation
    b, h, w, _ = x.shape
    eff_kh = (kh - 1) * dh + 1
    eff_kw = (kw - 1) * dw + 1

    if padding == "SAME":
        (pt, pb), (pl, pr) = _same_pads(h, sh, eff_kh), _same_pads(w, sw, eff_kw)
    elif padding == "VALID":
        (pt, pb), (pl, pr) = (0, 0), (0, 0)
    else:
        raise ValueError(padding)
    out_h = (h + pt + pb - eff_kh) // sh + 1
    out_w = (w + pl + pr - eff_kw) // sw + 1

    xp = jnp.pad(x, ((0, 0), (pt, pb), (pl, pr), (0, 0)))
    kernel_f32 = kernel.astype(jnp.float32)

    acc = jnp.zeros((b, out_h, out_w, c), dtype=jnp.float32)
    for i in range(kh):
        for j in range(kw):
            tap = lax.slice(
                xp,
                (0, i * dh, j * dw, 0),
                (b, i * dh + (out_h - 1) * sh + 1,
                 j * dw + (out_w - 1) * sw + 1, c),
                (1, sh, sw, 1),
            )
            acc = acc + tap.astype(jnp.float32) * kernel_f32[i, j, 0, :]
    return acc.astype(x.dtype)
