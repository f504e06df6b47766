"""Architecture blocks — mirror of the reference `ssdseglib.blocks` surface.

The reference exposes `deeplabv3plus_encoder`, `deeplabv3plus_decoder` and
`ssdlite` as Keras-graph functions (reference ssdseglib/blocks.py); the
TPU-native equivalents are Flax modules re-exported here under the familiar
names, alongside the conv primitives they are built from.
"""

from ssdseglib_tpu.models.blocks import (
    ConvBN,
    DepthwiseConvBN,
    SepConvBN,
    bilinear_resize,
    channel_shuffle,
)
from ssdseglib_tpu.models.heads import (
    DeepLabV3PlusDecoder,
    DeepLabV3PlusEncoder,
    SsdLiteBlock,
    SsdLiteHeads,
)

# reference-surface aliases (ssdseglib/blocks.py:4, :76, :134)
deeplabv3plus_encoder = DeepLabV3PlusEncoder
deeplabv3plus_decoder = DeepLabV3PlusDecoder
ssdlite = SsdLiteBlock

__all__ = [
    "ConvBN",
    "DepthwiseConvBN",
    "SepConvBN",
    "bilinear_resize",
    "channel_shuffle",
    "DeepLabV3PlusDecoder",
    "DeepLabV3PlusEncoder",
    "SsdLiteBlock",
    "SsdLiteHeads",
    "deeplabv3plus_encoder",
    "deeplabv3plus_decoder",
    "ssdlite",
]
