"""Primitive conv blocks (Flax linen), NHWC, MXU-friendly.

These are the atoms the reference builds its whole zoo from
(reference ssdseglib/models.py:47-113, blocks.py) as Keras layers:
conv -> batchnorm -> (capped) relu, depthwise variants, and the
SeparableConv pattern (depthwise then pointwise, batchnorm after the
pointwise only — matching Keras `SeparableConv2D` + external BN).

Batch-norm hyperparameters match Keras defaults the reference relies on
(momentum 0.99, epsilon 1e-3).

Activation convention (``relu_max``):
    None  -> no activation (e.g. the MobileNetV2 project block)
    0.0   -> uncapped ReLU
    x > 0 -> ReLU capped at x (ReLU6 with 6.0)
The reference encodes "uncapped" as Keras ``ReLU(max_value=0.0)`` on its
ShuffleNet head path, which in Keras actually clamps everything to zero
(reference blocks.py:154 with the 0.0 default) — a latent bug in the
author-untested path.  We use the sane reading (0.0 == uncapped).
"""

from __future__ import annotations

from typing import Optional, Tuple, Union

import flax.linen as nn
import jax.numpy as jnp

BN_MOMENTUM = 0.99
BN_EPSILON = 1e-3


def _pair(v: Union[int, Tuple[int, int]]) -> Tuple[int, int]:
    return (v, v) if isinstance(v, int) else tuple(v)


def apply_relu(x: jnp.ndarray, relu_max: Optional[float]) -> jnp.ndarray:
    if relu_max is None:
        return x
    x = nn.relu(x)
    if relu_max > 0.0:
        x = jnp.minimum(x, relu_max)
    return x


class ConvBN(nn.Module):
    """Pointwise/standard conv -> batchnorm -> optional capped relu."""

    features: int
    kernel_size: Union[int, Tuple[int, int]] = 1
    strides: Union[int, Tuple[int, int]] = 1
    dilation: Union[int, Tuple[int, int]] = 1
    relu_max: Optional[float] = None
    use_bias: bool = False
    use_bn: bool = True

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        x = nn.Conv(
            self.features,
            _pair(self.kernel_size),
            strides=_pair(self.strides),
            kernel_dilation=_pair(self.dilation),
            padding="SAME",
            use_bias=self.use_bias,
            name="conv",
        )(x)
        if self.use_bn:
            x = nn.BatchNorm(
                use_running_average=not train,
                momentum=BN_MOMENTUM,
                epsilon=BN_EPSILON,
                name="batchnorm",
            )(x)
        return apply_relu(x, self.relu_max)


class DepthwiseConvBN(nn.Module):
    """Depthwise conv (one filter per channel) -> batchnorm -> optional relu."""

    kernel_size: Union[int, Tuple[int, int]] = 3
    strides: Union[int, Tuple[int, int]] = 1
    dilation: Union[int, Tuple[int, int]] = 1
    relu_max: Optional[float] = None

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        channels = x.shape[-1]
        x = nn.Conv(
            channels,
            _pair(self.kernel_size),
            strides=_pair(self.strides),
            kernel_dilation=_pair(self.dilation),
            padding="SAME",
            feature_group_count=channels,
            use_bias=False,
            name="conv",
        )(x)
        x = nn.BatchNorm(
            use_running_average=not train,
            momentum=BN_MOMENTUM,
            epsilon=BN_EPSILON,
            name="batchnorm",
        )(x)
        return apply_relu(x, self.relu_max)


class SepConvBN(nn.Module):
    """Keras-style SeparableConv2D + BN + optional relu.

    Depthwise then pointwise with nothing in between; a single batchnorm
    after the pointwise (matches `SeparableConv2D(use_bias=False)` followed
    by `BatchNormalization`, e.g. reference blocks.py:152-154).
    """

    features: int
    kernel_size: Union[int, Tuple[int, int]] = 3
    strides: Union[int, Tuple[int, int]] = 1
    dilation: Union[int, Tuple[int, int]] = 1
    relu_max: Optional[float] = None

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        channels = x.shape[-1]
        x = nn.Conv(
            channels,
            _pair(self.kernel_size),
            strides=_pair(self.strides),
            kernel_dilation=_pair(self.dilation),
            padding="SAME",
            feature_group_count=channels,
            use_bias=False,
            name="depthwise",
        )(x)
        x = nn.Conv(
            self.features, (1, 1), padding="SAME", use_bias=False, name="pointwise"
        )(x)
        x = nn.BatchNorm(
            use_running_average=not train,
            momentum=BN_MOMENTUM,
            epsilon=BN_EPSILON,
            name="batchnorm",
        )(x)
        return apply_relu(x, self.relu_max)


def channel_shuffle(x: jnp.ndarray, groups: int = 2) -> jnp.ndarray:
    """ShuffleNet channel shuffle — reshape/transpose/reshape, pure layout.

    Reference ssdseglib/models.py:480-505 does this with Keras
    Reshape/Permute layers; on TPU it is a free relayout XLA folds away.
    """
    b, h, w, c = x.shape
    x = x.reshape(b, h, w, groups, c // groups)
    x = jnp.swapaxes(x, 3, 4)
    return x.reshape(b, h, w, c)


def bilinear_resize(x: jnp.ndarray, height: int, width: int) -> jnp.ndarray:
    """Bilinear resize with TF half-pixel-center semantics.

    Matches Keras `UpSampling2D(interpolation='bilinear')` =
    `tf.image.resize` (reference blocks.py:61, :104, :129).
    """
    import jax.image

    b, _, _, c = x.shape
    return jax.image.resize(x, (b, height, width, c), method="bilinear")
