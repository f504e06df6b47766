"""Shift-multiply depthwise lowering (ops/depthwise.py): exact geometry +
numeric parity with lax.conv_general_dilated, including through autodiff
and the full model."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ssdseglib_tpu.ops.depthwise import depthwise_conv_shift


@pytest.mark.parametrize(
    "h,w,c,stride,dilation",
    [
        (16, 24, 8, 1, 1),
        (15, 21, 8, 2, 1),   # odd sizes, stride 2 (SAME asym padding)
        (16, 24, 8, 2, 1),
        (12, 16, 8, 1, 3),   # dilation (ASPP-style)
        (9, 11, 3, 2, 2),
    ],
)
def test_matches_lax_conv(h, w, c, stride, dilation):
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(2, h, w, c)).astype(np.float32))
    k = jnp.asarray(rng.normal(size=(3, 3, 1, c)).astype(np.float32))

    ours = depthwise_conv_shift(
        x, k, strides=(stride, stride), dilation=(dilation, dilation)
    )
    ref = jax.lax.conv_general_dilated(
        x, k, window_strides=(stride, stride), padding="SAME",
        rhs_dilation=(dilation, dilation),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        feature_group_count=c,
    )
    assert ours.shape == ref.shape
    np.testing.assert_allclose(np.asarray(ours), np.asarray(ref), rtol=1e-5, atol=1e-5)


def test_gradients_match_lax_conv():
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.normal(size=(2, 12, 16, 6)).astype(np.float32))
    k = jnp.asarray(rng.normal(size=(3, 3, 1, 6)).astype(np.float32))

    def loss_shift(x, k):
        return jnp.sum(jnp.sin(depthwise_conv_shift(x, k, (2, 2), (1, 1))))

    def loss_conv(x, k):
        y = jax.lax.conv_general_dilated(
            x, k, (2, 2), "SAME",
            dimension_numbers=("NHWC", "HWIO", "NHWC"), feature_group_count=6,
        )
        return jnp.sum(jnp.sin(y))

    gx1, gk1 = jax.grad(loss_shift, argnums=(0, 1))(x, k)
    gx2, gk2 = jax.grad(loss_conv, argnums=(0, 1))(x, k)
    np.testing.assert_allclose(np.asarray(gx1), np.asarray(gx2), rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(gk1), np.asarray(gk2), rtol=1e-5, atol=1e-5)


def test_full_model_impl_parity():
    """Same variables, same outputs under either lowering (param trees are
    identical by construction)."""
    from ssdseglib_tpu.config import ModelConfig
    from ssdseglib_tpu.models import blocks
    from ssdseglib_tpu.models.builder import SsdSegModel

    cfg = ModelConfig(
        input_image_shape=(64, 96, 3),
        number_of_classes=4,
        boxes_per_point=(4, 4, 4, 4),
        backbone="mobilenetv2",
        segmentation_dilation_rates=(3, 6, 12),
    )
    x = jnp.asarray(
        np.random.default_rng(2).uniform(0, 255, (2, 64, 96, 3)).astype(np.float32)
    )
    module = SsdSegModel(cfg=cfg)
    try:
        blocks.set_depthwise_impl("conv")
        variables = module.init(jax.random.key(0), x, train=False)
        out_conv = module.apply(variables, x, train=False)
        blocks.set_depthwise_impl("shift")
        variables_shift = module.init(jax.random.key(0), x, train=False)
        out_shift = module.apply(variables, x, train=False)
    finally:
        blocks.set_depthwise_impl("conv")

    # identical parameter trees (paths and shapes)
    flat_a = jax.tree_util.tree_flatten_with_path(variables)[0]
    flat_b = jax.tree_util.tree_flatten_with_path(variables_shift)[0]
    assert [(k, v.shape) for k, v in flat_a] == [(k, v.shape) for k, v in flat_b]

    for key in out_conv:
        np.testing.assert_allclose(
            np.asarray(out_shift[key]), np.asarray(out_conv[key]),
            rtol=1e-4, atol=1e-5, err_msg=key,
        )


def test_set_depthwise_impl_validates():
    from ssdseglib_tpu.models import blocks

    with pytest.raises(ValueError, match="depthwise impl"):
        blocks.set_depthwise_impl("fast")
