"""MobileNetV2 backbone (Flax), exact channel plan of the reference.

Reference: ssdseglib/models.py:47-215 (hand-built inverted residual
backbone).  Block numbering and tap names mirror the reference layer names
so the `.keras` weight importer can map parameters one-to-one:

    stem        -> backbone-block0-{expand,depthwise,project}
    24 x2 s2    -> blocks 1-2
    32 x3 s2    -> blocks 3-5
    64 x4 s2    -> blocks 6-9
    96 x3 s1    -> blocks 10-12
    160 x3 s2   -> blocks 13-15
    320 x1 s1   -> block 16

Taps exposed (consumed by the heads, reference models.py:229-230, :299):
    'backbone-block3-expand-relu6'      (os4 skip for the mask decoder)
    'backbone-block13-expand-relu6'     (os16)
    'backbone-block16-project-batchnorm' (os32)

Residual `Add` only from the second repeat of a sequence
(reference models.py:161-164).
"""

from __future__ import annotations

from typing import Dict, Tuple

import flax.linen as nn
import jax.numpy as jnp

from ssdseglib_tpu.models.blocks import ConvBN, DepthwiseConvBN

# (expansion, channels_out, n_repeat, first_stride)
_SEQUENCES: Tuple[Tuple[int, int, int, int], ...] = (
    (6, 24, 2, 2),
    (6, 32, 3, 2),
    (6, 64, 4, 2),
    (6, 96, 3, 1),
    (6, 160, 3, 2),
    (6, 320, 1, 1),
)


class MobileNetV2Backbone(nn.Module):
    """Returns (final feature map, taps dict keyed by reference layer name)."""

    @nn.compact
    def __call__(
        self, x: jnp.ndarray, train: bool = False
    ) -> Tuple[jnp.ndarray, Dict[str, jnp.ndarray]]:
        taps: Dict[str, jnp.ndarray] = {}

        # stem (block 0): expand k3 s2 -> depthwise s1 -> project 16
        x = ConvBN(
            32, kernel_size=3, strides=2, relu_max=6.0, name="backbone-block0-expand"
        )(x, train)
        x = DepthwiseConvBN(strides=1, relu_max=6.0, name="backbone-block0-depthwise")(
            x, train
        )
        x = ConvBN(16, relu_max=None, name="backbone-block0-project")(x, train)

        block = 0
        for expansion, channels_out, n_repeat, stride in _SEQUENCES:
            for n in range(n_repeat):
                block += 1
                channels_in = x.shape[-1]
                expanded = ConvBN(
                    channels_in * expansion,
                    relu_max=6.0,
                    name=f"backbone-block{block}-expand",
                )(x, train)
                taps[f"backbone-block{block}-expand-relu6"] = expanded
                y = DepthwiseConvBN(
                    strides=stride if n == 0 else 1,
                    relu_max=6.0,
                    name=f"backbone-block{block}-depthwise",
                )(expanded, train)
                y = ConvBN(
                    channels_out, relu_max=None, name=f"backbone-block{block}-project"
                )(y, train)
                taps[f"backbone-block{block}-project-batchnorm"] = y
                x = x + y if n > 0 else y
        return x, taps
