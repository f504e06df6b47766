"""Fused MBConv Pallas kernel parity vs the Flax ConvBN path (interpret
mode on CPU; the real-TPU speed numbers live in docs/PERFORMANCE.md)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import flax.linen as nn

from ssdseglib_tpu.models.blocks import ConvBN, DepthwiseConvBN
from ssdseglib_tpu.ops.fused_mbconv import fold_block, fold_conv_bn, fused_mbconv


class _Block(nn.Module):
    """Reference MBConv block wired exactly like MobileNetV2Backbone."""

    expansion: int
    channels_out: int
    block: int = 1
    residual: bool = True

    @nn.compact
    def __call__(self, x, train=False):
        cin = x.shape[-1]
        e = ConvBN(cin * self.expansion, relu_max=6.0,
                   name=f"backbone-block{self.block}-expand")(x, train)
        d = DepthwiseConvBN(strides=1, relu_max=6.0,
                            name=f"backbone-block{self.block}-depthwise")(e, train)
        p = ConvBN(self.channels_out, relu_max=None,
                   name=f"backbone-block{self.block}-project")(d, train)
        return x + p if self.residual else p


def _random_block_variables(rng_key, cin, expansion, cout, h, w):
    module = _Block(expansion=expansion, channels_out=cout, residual=(cin == cout))
    variables = module.init(rng_key, jnp.zeros((1, h, w, cin)))
    # randomize batch stats so BN folding is non-trivial
    rng = np.random.default_rng(0)
    stats = jax.tree_util.tree_map(
        lambda x: jnp.asarray(
            rng.uniform(0.5, 1.5, x.shape).astype(np.float32)
        ),
        variables["batch_stats"],
    )
    return module, {"params": variables["params"], "batch_stats": stats}


@pytest.mark.parametrize(
    "cin,expansion,cout,h,w,residual",
    [
        (16, 6, 16, 12, 16, True),
        (24, 6, 24, 10, 12, True),
        (32, 4, 48, 8, 8, False),
    ],
)
def test_fused_matches_flax(cin, expansion, cout, h, w, residual):
    module, variables = _random_block_variables(
        jax.random.key(1), cin, expansion, cout, h, w
    )
    rng = np.random.default_rng(2)
    x = jnp.asarray(rng.normal(size=(2, h, w, cin)).astype(np.float32))

    expected = module.apply(variables, x, train=False)

    folded = fold_block(variables["params"], variables["batch_stats"], block=1)
    got = fused_mbconv(x, *folded, residual=residual, interpret=True)

    np.testing.assert_allclose(
        np.asarray(got), np.asarray(expected), rtol=1e-4, atol=1e-4
    )


def test_fold_conv_bn_math():
    rng = np.random.default_rng(3)
    kernel = rng.normal(size=(1, 1, 8, 16)).astype(np.float32)
    gamma = rng.uniform(0.5, 1.5, 16).astype(np.float32)
    beta = rng.normal(size=16).astype(np.float32)
    mean = rng.normal(size=16).astype(np.float32)
    var = rng.uniform(0.5, 2.0, 16).astype(np.float32)

    x = rng.normal(size=(4, 8)).astype(np.float32)
    conv_out = x @ kernel[0, 0]
    eps = 1e-3
    bn_out = (conv_out - mean) / np.sqrt(var + eps) * gamma + beta

    k2, b2 = fold_conv_bn(kernel, gamma, beta, mean, var, eps)
    np.testing.assert_allclose(x @ k2[0, 0] + b2, bn_out, rtol=1e-5, atol=1e-5)
