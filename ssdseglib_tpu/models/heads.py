"""Task heads (Flax): SSDLite detection + DeepLabV3+ segmentation.

Reference: ssdseglib/blocks.py (deeplabv3plus_encoder :4, deeplabv3plus_
decoder :76, ssdlite :134) and the head assembly in models.py:217-312.

Reference quirk preserved (checkpoint parity, SURVEY.md C10): the reference
swaps the `filters`/`output_channels` parameterization of the labels vs
boxes branches — the labels branches always use 4 output channels (the
number of box coordinates) and the boxes branches use `number_of_classes`
(models.py:250-268).  This only classifies correctly because the trained
config has num_classes == 4.  We reproduce the exact parameterization.
"""

from __future__ import annotations

from typing import Optional, Sequence, Tuple

import flax.linen as nn
import jax.numpy as jnp

from ssdseglib_tpu.models import blocks as blocks_lib
from ssdseglib_tpu.models.blocks import ConvBN, SepConvBN, bilinear_resize


class SsdLiteBlock(nn.Module):
    """SepConv -> BN -> relu -> reshape(-1, out_channels).

    Reference blocks.py:134-157.  The reshape flattens (H, W, bpp * ch) to
    (H * W * bpp, ch) row-major — the same ordering as the flat anchors.
    """

    filters: int
    output_channels: int
    relu_max: Optional[float] = 0.0

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        x = SepConvBN(
            self.filters, kernel_size=3, relu_max=self.relu_max, name="sepconv"
        )(x, train)
        b = x.shape[0]
        return x.reshape(b, -1, self.output_channels)


class SsdLiteHeads(nn.Module):
    """Per-feature-map classification + regression branches.

    Reference models.py:246-273.  Outputs:
        labels: (B, total_boxes, 4) softmax probabilities (see quirk above)
        boxes:  (B, total_boxes, num_classes) raw offsets (see quirk above)
    """

    boxes_per_point: Tuple[int, ...]
    number_of_classes: int
    relu_max: Optional[float] = 6.0

    @nn.compact
    def __call__(
        self, feature_maps: Sequence[jnp.ndarray], train: bool = False
    ) -> Tuple[jnp.ndarray, jnp.ndarray]:
        labels = jnp.concatenate(
            [
                SsdLiteBlock(
                    filters=self.boxes_per_point[i] * 4,
                    output_channels=4,
                    relu_max=self.relu_max,
                    name=f"labels{i + 1}",
                )(fm, train)
                for i, fm in enumerate(feature_maps)
            ],
            axis=1,
        )
        labels = nn.softmax(labels, axis=-1)

        boxes = jnp.concatenate(
            [
                SsdLiteBlock(
                    filters=self.boxes_per_point[i] * self.number_of_classes,
                    output_channels=self.number_of_classes,
                    relu_max=self.relu_max,
                    name=f"boxes{i + 1}",
                )(fm, train)
                for i, fm in enumerate(feature_maps)
            ],
            axis=1,
        )
        return labels, boxes


class DeepLabV3PlusEncoder(nn.Module):
    """ASPP encoder: pointwise + 3 atrous sepconv branches + image pooling.

    Reference blocks.py:4-74.  The pooling branch global-average-pools to
    1x1, convs, and bilinearly "upsamples" back (a broadcast).
    """

    filters: int = 256
    dilation_rates: Tuple[int, int, int] = (6, 12, 18)
    relu_max: Optional[float] = 0.0

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        h, w = x.shape[1], x.shape[2]

        pointwise = ConvBN(
            self.filters, relu_max=self.relu_max, name="aspp-pointwise"
        )(x, train)
        atrous = [
            SepConvBN(
                self.filters,
                kernel_size=3,
                dilation=rate,
                relu_max=self.relu_max,
                name=f"aspp-atrous{i + 1}",
            )(x, train)
            for i, rate in enumerate(self.dilation_rates)
        ]

        pooled = jnp.mean(x, axis=(1, 2), keepdims=True)
        pooled = ConvBN(self.filters, relu_max=self.relu_max, name="pooling")(
            pooled, train
        )
        pooled = jnp.broadcast_to(pooled, (x.shape[0], h, w, self.filters))

        out = jnp.concatenate([pointwise] + atrous + [pooled], axis=-1)
        return ConvBN(self.filters, relu_max=self.relu_max, name="output")(out, train)


class DeepLabV3PlusDecoder(nn.Module):
    """Skip-refined decoder producing the softmax segmentation mask.

    Reference blocks.py:76-132: upsample encoder output to the skip
    resolution, reduce the skip with a pointwise conv (48 filters), concat,
    refine with conv + sepconv, project to classes, upsample to full
    resolution, softmax.
    """

    filters_backbone: Optional[int] = 48
    filters_decoder: int = 256
    output_height_width: Tuple[int, int] = (480, 640)
    output_channels: int = 4
    relu_max: Optional[float] = 0.0

    @nn.compact
    def __call__(
        self, encoder: jnp.ndarray, skip: jnp.ndarray, train: bool = False
    ) -> jnp.ndarray:
        encoder = bilinear_resize(encoder, skip.shape[1], skip.shape[2])

        if self.filters_backbone is not None:
            skip = ConvBN(
                self.filters_backbone, relu_max=self.relu_max, name="backbone-reduce"
            )(skip, train)

        x = jnp.concatenate([encoder, skip], axis=-1)
        x = ConvBN(
            self.filters_decoder, kernel_size=3, relu_max=self.relu_max, name="conv"
        )(x, train)
        x = SepConvBN(
            self.filters_decoder, kernel_size=3, relu_max=self.relu_max, name="sepconv"
        )(x, train)
        x = blocks_lib.dense_conv(
            self.output_channels, 3, name="output-conv"
        )(x)
        x = bilinear_resize(x, *self.output_height_width)
        return nn.softmax(x, axis=-1)
