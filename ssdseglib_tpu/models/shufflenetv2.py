"""ShuffleNetV2 backbone (Flax), reference channel presets and wiring.

Reference: ssdseglib/models.py:425-652.  Stage channel presets per model
size (models.py:459-468): 0.5x {48, 96, 192}, 1x {116, 232, 464},
1.5x {176, 352, 704}, 2x {244, 488, 976}.  Stages 2/3/4 are one
downsampling unit followed by 3/7/3 basic units.  The channel shuffle is a
reshape/transpose (free on XLA).

Taps exposed (reference models.py:666-667, :748):
    'backbone-stage2-block3' (os8 skip for the mask decoder)
    'backbone-stage3-block7' (os16)
    'backbone-stage4-block3' (os32)

Options mirrored: `use_additional_depthwise_convolution` adds a depthwise
conv before the first pointwise in each unit (models.py:532-537, :576-581);
`use_residual_connections` adds the basic-unit residual add (models.py:592).
"""

from __future__ import annotations

from typing import Dict, Tuple

import flax.linen as nn
import jax.numpy as jnp

from ssdseglib_tpu.models import blocks as blocks_lib
from ssdseglib_tpu.models.blocks import ConvBN, DepthwiseConvBN, channel_shuffle

STAGE_CHANNELS = {
    "0.5x": {2: 48, 3: 96, 4: 192},
    "1x": {2: 116, 3: 232, 4: 464},
    "1.5x": {2: 176, 3: 352, 4: 704},
    "2x": {2: 244, 3: 488, 4: 976},
}


class ShuffleNetV2Backbone(nn.Module):
    model_size: str = "1x"
    use_additional_depthwise_convolution: bool = False
    use_residual_connections: bool = False

    def _downsampling_unit(
        self, x: jnp.ndarray, output_channels: int, prefix: str, train: bool
    ) -> jnp.ndarray:
        filters = output_channels // 2

        left = DepthwiseConvBN(
            kernel_size=3, strides=2, relu_max=None, name=f"{prefix}branch-left-depthconv1"
        )(x, train)
        left = ConvBN(filters, relu_max=0.0, name=f"{prefix}branch-left-conv2")(
            left, train
        )

        right = x
        if self.use_additional_depthwise_convolution:
            right = DepthwiseConvBN(
                kernel_size=3, relu_max=None, name=f"{prefix}branch-right-depthconv0"
            )(right, train)
        right = ConvBN(filters, relu_max=0.0, name=f"{prefix}branch-right-conv1")(
            right, train
        )
        right = DepthwiseConvBN(
            kernel_size=3, strides=2, relu_max=None, name=f"{prefix}branch-right-depthconv2"
        )(right, train)
        right = ConvBN(filters, relu_max=0.0, name=f"{prefix}branch-right-conv3")(
            right, train
        )

        return channel_shuffle(jnp.concatenate([left, right], axis=-1))

    def _basic_unit(
        self, x: jnp.ndarray, output_channels: int, prefix: str, train: bool
    ) -> jnp.ndarray:
        filters = output_channels // 2
        identity, branch_in = jnp.split(x, 2, axis=-1)

        branch = branch_in
        if self.use_additional_depthwise_convolution:
            branch = DepthwiseConvBN(
                kernel_size=3, relu_max=None, name=f"{prefix}branch-conv-depthconv0"
            )(branch, train)
        branch = ConvBN(filters, relu_max=0.0, name=f"{prefix}branch-conv-conv1")(
            branch, train
        )
        branch = DepthwiseConvBN(
            kernel_size=3, relu_max=None, name=f"{prefix}branch-conv-depthconv2"
        )(branch, train)
        branch = ConvBN(filters, relu_max=None, name=f"{prefix}branch-conv-conv3")(
            branch, train
        )
        if self.use_residual_connections:
            branch = branch + branch_in
        branch = nn.relu(branch)

        return channel_shuffle(jnp.concatenate([identity, branch], axis=-1))

    @nn.compact
    def __call__(
        self, x: jnp.ndarray, train: bool = False
    ) -> Tuple[jnp.ndarray, Dict[str, jnp.ndarray]]:
        channels = STAGE_CHANNELS[self.model_size]
        taps: Dict[str, jnp.ndarray] = {}

        # stage 1: conv24 k3 s2 (with bias, no BN — reference models.py:628)
        # + maxpool 3x3 s2
        x = blocks_lib.dense_conv(
            24, 3, strides=2, use_bias=True, name="backbone-stage1-conv"
        )(x)
        x = nn.max_pool(x, (3, 3), strides=(2, 2), padding="SAME")

        for stage, n_blocks in ((2, 3), (3, 7), (4, 3)):
            x = self._downsampling_unit(
                x, channels[stage], f"backbone-stage{stage}-downblock-", train
            )
            for b in range(n_blocks):
                x = self._basic_unit(
                    x, channels[stage], f"backbone-stage{stage}-block{b + 1}-", train
                )
            taps[f"backbone-stage{stage}-block{n_blocks}"] = x
        return x, taps
