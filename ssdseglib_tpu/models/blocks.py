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
import jax
import jax.numpy as jnp

BN_MOMENTUM = 0.99
BN_EPSILON = 1e-3

# Depthwise convolution lowering: 'conv' = lax.conv_general_dilated with
# feature_group_count (XLA convolution unit), 'shift' = K*K shifted
# multiply-adds (ops/depthwise.py — VPU loop fusions). A/B on v5e showed
# 'shift' LOSES decisively for training (157 vs 59 ms/step, examples/07
# round 3) — kept as a parity-tested opt-in negative result, same policy
# as the round-2 s2d stem study (docs/PERFORMANCE.md).
# Trace-time switch: set before building/jitting a model.
DEPTHWISE_IMPL = "conv"

# Weight-gradient lowering for every model conv: 'dot' routes convs
# through ops/conv_backward.conv2d_fast_wgrad (1x1 wgrad as one giant-K
# dot_general — same contraction, f32 accumulation; forward and
# input-gradient stay XLA's), 'xla' = plain nn.Conv.  Measured A/B on v5e
# (tests/tpu_scripts/wgrad_ab.py, interleaved best-of-2): 'dot' LOSES
# 58.8 -> 61.7 ms/step, and the per-tap slice variant for k>1/depthwise
# lost 58.9 -> 88.3 — XLA's own conv-wgrad lowering wins for every shape
# here.  Kept as a parity-tested opt-in negative result (same policy as
# the s2d stem and dw-shift studies, docs/PERFORMANCE.md round 3).
# Trace-time switch: set before building/jitting a model.
WGRAD_IMPL = "xla"


def set_depthwise_impl(impl: str) -> None:
    global DEPTHWISE_IMPL
    if impl not in ("conv", "shift"):
        raise ValueError(f"depthwise impl must be 'conv' or 'shift', got {impl!r}")
    DEPTHWISE_IMPL = impl


# Depthwise BACKWARD lowering (forward stays XLA's conv either way):
# 'pallas' routes stride-1 SAME 3x3 depthwise convs inside the measured
# envelope (ops/depthwise_backward.pallas_bwd_applicable — in the flagship
# model that is block0-dw, the single most expensive backward op in the
# round-3 train profile at 4.08 ms) through the fused one-pass Pallas
# dgrad+wgrad kernel; everything else keeps XLA's vjp.  Measured A/B on
# v5e (tests/tpu_scripts/dw_bwd_ab.py, interleaved best-of-2): 'pallas'
# LOSES e2e 59.0 -> 62.0 ms/step despite a 1.3-1.4x standalone win on the
# isolated op — the custom-call boundary un-fuses the BN/ReLU6 gradient
# chains XLA folds into its own dw-backward convs.  Kept as a
# parity-tested opt-in negative result (docs/PERFORMANCE.md round 3).
# Trace-time switch: set before building/jitting a model.
DEPTHWISE_BWD_IMPL = "xla"


def set_depthwise_bwd_impl(impl: str) -> None:
    global DEPTHWISE_BWD_IMPL
    if impl not in ("xla", "pallas"):
        raise ValueError(
            f"depthwise bwd impl must be 'xla' or 'pallas', got {impl!r}"
        )
    DEPTHWISE_BWD_IMPL = impl


# Whole-CHAIN backward lowering for DepthwiseConvBN(+ReLU6) in train mode:
# 'pallas' routes the full dw3x3+BN+ReLU6 unit (inside the measured
# envelope — block0-dw in the flagship) through ONE custom-VJP whose
# backward is a single fused Pallas pass (ops/fused_chain_backward.py):
# mask + BN gradient chain + dgrad + wgrad with nothing materialized to
# HBM between them.  This is the round-3 depthwise study's own named fix
# for why the conv-only kernel lost e2e (the custom-call boundary
# un-fused the elementwise chains).  Measured outcome: see
# docs/PERFORMANCE.md round-4 whole-chain study.
# Trace-time switch: set before building/jitting a model.
CHAIN_BWD_IMPL = "xla"


def set_chain_bwd_impl(impl: str) -> None:
    global CHAIN_BWD_IMPL
    if impl not in ("xla", "pallas"):
        raise ValueError(
            f"chain bwd impl must be 'xla' or 'pallas', got {impl!r}"
        )
    CHAIN_BWD_IMPL = impl


def set_wgrad_impl(impl: str) -> None:
    global WGRAD_IMPL
    if impl not in ("xla", "dot"):
        raise ValueError(f"wgrad impl must be 'xla' or 'dot', got {impl!r}")
    WGRAD_IMPL = impl


def _pair(v: Union[int, Tuple[int, int]]) -> Tuple[int, int]:
    return (v, v) if isinstance(v, int) else tuple(v)


class _FastWgradConv(nn.Module):
    """Drop-in for `nn.Conv(..., padding='SAME')` routing through
    `ops/conv_backward.conv2d_fast_wgrad`: IDENTICAL parameter names and
    shapes ('kernel' (kh, kw, Cin/groups, Cout), optional 'bias'), so
    checkpoints, the Keras importer and the golden tests are
    implementation-agnostic."""

    features: int
    kernel_size: Tuple[int, int]
    strides: Tuple[int, int] = (1, 1)
    dilation: Tuple[int, int] = (1, 1)
    groups: int = 1
    use_bias: bool = False

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        from ssdseglib_tpu.ops.conv_backward import conv2d_fast_wgrad

        kh, kw = self.kernel_size
        kernel = self.param(
            "kernel",
            nn.initializers.lecun_normal(),
            (kh, kw, x.shape[-1] // self.groups, self.features),
            jnp.float32,
        )
        y = conv2d_fast_wgrad(
            x, kernel.astype(x.dtype), self.strides, self.dilation, self.groups
        )
        if self.use_bias:
            bias = self.param(
                "bias", nn.initializers.zeros, (self.features,), jnp.float32
            )
            y = y + bias.astype(y.dtype)
        return y


def dense_conv(
    features: int,
    kernel_size,
    strides=1,
    dilation=1,
    use_bias: bool = False,
    name: str = "conv",
):
    """Standard (group=1) conv module through the selected weight-gradient
    lowering (WGRAD_IMPL)."""
    if WGRAD_IMPL == "dot":
        return _FastWgradConv(
            features=features,
            kernel_size=_pair(kernel_size),
            strides=_pair(strides),
            dilation=_pair(dilation),
            use_bias=use_bias,
            name=name,
        )
    return nn.Conv(
        features,
        _pair(kernel_size),
        strides=_pair(strides),
        kernel_dilation=_pair(dilation),
        padding="SAME",
        use_bias=use_bias,
        name=name,
    )


class _ShiftDepthwiseConv(nn.Module):
    """Drop-in for `nn.Conv(feature_group_count=C)`: IDENTICAL parameter
    name/shape ('kernel', (kh, kw, 1, C)) so checkpoints, the Keras
    importer and golden tests are impl-agnostic."""

    kernel_size: Tuple[int, int]
    strides: Tuple[int, int]
    dilation: Tuple[int, int]

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        from ssdseglib_tpu.ops.depthwise import depthwise_conv_shift

        kh, kw = self.kernel_size
        kernel = self.param(
            "kernel",
            nn.initializers.lecun_normal(),
            (kh, kw, 1, x.shape[-1]),
            jnp.float32,
        )
        return depthwise_conv_shift(
            x, kernel.astype(x.dtype), self.strides, self.dilation
        )


class _PallasBwdDepthwiseConv(nn.Module):
    """Drop-in for `nn.Conv(feature_group_count=C)` with the fused Pallas
    backward (ops/depthwise_backward.py).  IDENTICAL parameter name/shape
    ('kernel', (3, 3, 1, C)) and bit-identical forward, so checkpoints,
    the Keras importer and golden tests are impl-agnostic."""

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        from ssdseglib_tpu.ops.depthwise_backward import (
            depthwise_conv3x3_fused_bwd,
        )

        kernel = self.param(
            "kernel",
            nn.initializers.lecun_normal(),
            (3, 3, 1, x.shape[-1]),
            jnp.float32,
        )
        return depthwise_conv3x3_fused_bwd(x, kernel.astype(x.dtype))


def depthwise_conv(
    x: jnp.ndarray,
    kernel_size,
    strides,
    dilation,
    name: str,
) -> jnp.ndarray:
    """Depthwise conv through the selected lowering (DEPTHWISE_IMPL)."""
    if DEPTHWISE_IMPL == "shift":
        return _ShiftDepthwiseConv(
            kernel_size=_pair(kernel_size),
            strides=_pair(strides),
            dilation=_pair(dilation),
            name=name,
        )(x)
    channels = x.shape[-1]
    if DEPTHWISE_BWD_IMPL == "pallas":
        from ssdseglib_tpu.ops.depthwise_backward import pallas_bwd_applicable

        _, h, w, c = x.shape
        if pallas_bwd_applicable(
            h, w, c, _pair(kernel_size), _pair(strides), _pair(dilation)
        ):
            return _PallasBwdDepthwiseConv(name=name)(x)
    if WGRAD_IMPL == "dot":
        return _FastWgradConv(
            features=channels,
            kernel_size=_pair(kernel_size),
            strides=_pair(strides),
            dilation=_pair(dilation),
            groups=channels,
            name=name,
        )(x)
    return nn.Conv(
        channels,
        _pair(kernel_size),
        strides=_pair(strides),
        kernel_dilation=_pair(dilation),
        padding="SAME",
        feature_group_count=channels,
        use_bias=False,
        name=name,
    )(x)


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
        x = dense_conv(
            self.features,
            self.kernel_size,
            strides=self.strides,
            dilation=self.dilation,
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


class _ParamHolder(nn.Module):
    """Declares one 'kernel' param under its module name (scope-compatible
    with `nn.Conv`'s tree, so checkpoints/importers are impl-agnostic)."""

    shape: Tuple[int, ...]

    @nn.compact
    def __call__(self):
        return self.param(
            "kernel", nn.initializers.lecun_normal(), self.shape, jnp.float32
        )


class _BNStateHolder(nn.Module):
    """Declares BN scale/bias params + running-stat variables under its
    module name, matching `nn.BatchNorm`'s tree exactly."""

    channels: int

    @nn.compact
    def __call__(self):
        scale = self.param(
            "scale", nn.initializers.ones, (self.channels,), jnp.float32
        )
        bias = self.param(
            "bias", nn.initializers.zeros, (self.channels,), jnp.float32
        )
        ra_mean = self.variable(
            "batch_stats", "mean",
            lambda: jnp.zeros((self.channels,), jnp.float32),
        )
        ra_var = self.variable(
            "batch_stats", "var",
            lambda: jnp.ones((self.channels,), jnp.float32),
        )
        return scale, bias, ra_mean, ra_var


class DepthwiseConvBN(nn.Module):
    """Depthwise conv (one filter per channel) -> batchnorm -> optional relu."""

    kernel_size: Union[int, Tuple[int, int]] = 3
    strides: Union[int, Tuple[int, int]] = 1
    dilation: Union[int, Tuple[int, int]] = 1
    relu_max: Optional[float] = None

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        if train and CHAIN_BWD_IMPL == "pallas":
            from ssdseglib_tpu.ops.fused_chain_backward import (
                chain_applicable,
            )

            _, h, w, c = x.shape
            if chain_applicable(
                h, w, c, _pair(self.kernel_size), _pair(self.strides),
                _pair(self.dilation), self.relu_max,
            ):
                return self._fused_chain(x)
        x = depthwise_conv(
            x, self.kernel_size, self.strides, self.dilation, name="conv"
        )
        x = nn.BatchNorm(
            use_running_average=not train,
            momentum=BN_MOMENTUM,
            epsilon=BN_EPSILON,
            name="batchnorm",
        )(x)
        return apply_relu(x, self.relu_max)

    def _fused_chain(self, x: jnp.ndarray) -> jnp.ndarray:
        """Train-mode forward through the whole-chain custom-VJP unit
        (ops/fused_chain_backward.dw_bn_relu6_chain).  Declares the SAME
        parameter/variable tree as the plain branch ('conv'/'kernel',
        'batchnorm'/{scale,bias} + batch_stats {mean,var}) and replicates
        `nn.BatchNorm`'s running-average update."""
        from ssdseglib_tpu.ops.fused_chain_backward import dw_bn_relu6_chain

        c = x.shape[-1]
        kernel = _ParamHolder(shape=(3, 3, 1, c), name="conv")()
        scale, bias, ra_mean, ra_var = _BNStateHolder(
            channels=c, name="batchnorm"
        )()
        y, mean, var = dw_bn_relu6_chain(
            x, kernel.astype(x.dtype), scale, bias
        )
        if not self.is_initializing():
            mean = jax.lax.stop_gradient(mean)
            var = jax.lax.stop_gradient(var)
            ra_mean.value = (
                BN_MOMENTUM * ra_mean.value + (1.0 - BN_MOMENTUM) * mean
            )
            ra_var.value = (
                BN_MOMENTUM * ra_var.value + (1.0 - BN_MOMENTUM) * var
            )
        return y


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
        x = depthwise_conv(
            x, self.kernel_size, self.strides, self.dilation, name="depthwise"
        )
        x = dense_conv(self.features, 1, name="pointwise")(x)
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
