"""Fast weight-gradients for the training convolutions.

Why: the round-3 train profile (docs/PERFORMANCE.md) shows ~15 ms of the
59 ms bf16 train step in the backward of the early, small-channel convs
(stem/block0/block1 at 240x320-480x640).  XLA lowers a conv's weight
gradient as another convolution whose *output* is the kernel — a tiny
(e.g. 32x16) result contracted over ~1.2M batch-spatial positions.  On
TPU that lowering lands ~100-300x off the HBM roofline for these shapes
(the 128-lane MXU is starved by 3-96-channel operands and the giant
contraction dimension is tiled as a spatial loop).

This module reformulates the weight gradient of **1x1 stride-1 dense
convs** (the MobileNetV2 expand/project layers, every SepConv pointwise,
the ASPP/decoder pointwise reductions) as a single giant-K `dot_general`
(K = B*H*W) over the operands exactly as laid out in HBM, keeping the
forward and the input gradient exactly XLA's.  k>1 / strided / depthwise
shapes keep XLA's own rule: a per-tap slice formulation was measured and
LOST (58.9 -> 88.3 ms/step e2e) because the `pad + strided-slice`
operands do not fuse into the contraction — XLA materializes k*k
full-size copies (see the gate comment in `_wgrad`).

The reformulation is mathematically the same contraction with f32
accumulation (what the MXU does inside a conv anyway); it is NOT a
numerics change beyond float-summation order.  Parity:
tests/test_conv_backward.py (vs `jax.vjp` of the plain conv) and the
golden gradient tests vs `tf.GradientTape` (tests/test_grad_parity.py)
run with the fast path enabled.

The reference trains these layers through cuDNN/Eigen's own wgrad
(reference notebook 03 cell 16 via Keras fit); this is the TPU-native
equivalent of that vendor kernel.
"""

from __future__ import annotations

import functools


import jax
import jax.numpy as jnp


def _plain_conv(x, kernel, strides, dilation, groups):
    return jax.lax.conv_general_dilated(
        x,
        kernel,
        strides,
        "SAME",
        rhs_dilation=dilation,
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        feature_group_count=groups,
    )


def _wgrad(x, g, kshape, strides, dilation, groups, out_dtype):
    """d(loss)/d(kernel) for conv_general_dilated(NHWC/HWIO, SAME).

    dk[ih, iw, i, o] = sum_{b, ho, wo} x_pad[b, ho*s + ih*d, wo*s + iw*d, i]
                                       * g[b, ho, wo, o]
    computed as one strided slice + contraction per kernel tap, f32
    accumulation, cast to the kernel dtype at the end.
    """
    kh, kw, ci_g, co = kshape
    B, H, W, Ci = x.shape
    _, Ho, Wo, _ = g.shape
    sh, sw = strides
    dh, dw = dilation
    depthwise = groups == Ci and ci_g == 1

    # Measured gate (v5e, examples/07): the reformulation WINS only for
    # 1x1 stride-1 dense convs, where it is a single giant-K matmul over
    # the operands exactly as laid out in HBM.  For k>1 / strided /
    # depthwise shapes the per-tap `pad + strided-slice` operands do NOT
    # fuse into the contraction — XLA materializes k*k full-size slice
    # copies, and the e2e train step regressed 58.9 -> 88.3 ms/step with
    # those paths enabled.  Everything else keeps XLA's own wgrad rule.
    if not (kh == kw == 1 and (sh, sw) == (1, 1) and groups == 1):
        _, pull = jax.vjp(
            lambda k: _plain_conv(x, k, strides, dilation, groups),
            jnp.zeros(kshape, out_dtype),
        )
        return pull(g)[0]

    if depthwise:  # pragma: no cover — unreachable under the gate above
        raise AssertionError

    dk = jax.lax.dot_general(
        x.reshape(-1, Ci),
        g.reshape(-1, co),
        (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )  # (Ci, Co)
    return dk.reshape(kh, kw, Ci, co).astype(out_dtype)


@functools.partial(jax.custom_vjp, nondiff_argnums=(2, 3, 4))
def conv2d_fast_wgrad(x, kernel, strides, dilation, groups):
    """`lax.conv_general_dilated` (NHWC/HWIO/SAME) with the weight-gradient
    reformulated for TPU (see module docstring).  Forward and input
    gradient are bit-identical to the plain conv; only the kernel-gradient
    lowering differs (same contraction, f32 accumulation)."""
    return _plain_conv(x, kernel, strides, dilation, groups)


def _fwd(x, kernel, strides, dilation, groups):
    return _plain_conv(x, kernel, strides, dilation, groups), (x, kernel)


def _bwd(strides, dilation, groups, res, g):
    x, kernel = res
    _, pull = jax.vjp(
        lambda x_: _plain_conv(x_, kernel, strides, dilation, groups), x
    )
    (dx,) = pull(g)
    dk = _wgrad(x, g, kernel.shape, strides, dilation, groups, kernel.dtype)
    return dx, dk


conv2d_fast_wgrad.defvjp(_fwd, _bwd)
