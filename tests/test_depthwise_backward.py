"""Parity tests for the fused Pallas depthwise-3x3 backward
(ssdseglib_tpu/ops/depthwise_backward.py) — interpret mode on CPU, vs
`jax.vjp` of the plain `lax.conv_general_dilated` depthwise conv."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ssdseglib_tpu.models import blocks
from ssdseglib_tpu.ops import depthwise_backward as dwb


def _plain(x, k):
    return jax.lax.conv_general_dilated(
        x, k, (1, 1), "SAME",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        feature_group_count=x.shape[-1],
    )


@pytest.mark.parametrize(
    "shape",
    [(2, 16, 6, 8), (1, 24, 10, 32), (3, 8, 4, 3), (2, 40, 7, 16)],
)
def test_kernel_matches_vjp(shape):
    rng = np.random.default_rng(sum(shape))
    b, h, w, c = shape
    x = jnp.asarray(rng.standard_normal(shape), jnp.float32)
    dy = jnp.asarray(rng.standard_normal(shape), jnp.float32)
    k = jnp.asarray(rng.standard_normal((3, 3, 1, c)) * 0.3, jnp.float32)

    _, pull = jax.vjp(_plain, x, k)
    dx_ref, dk_ref = pull(dy)
    dx, dk = dwb.depthwise3x3_backward(x, dy, k, interpret=True)
    np.testing.assert_allclose(dx, dx_ref, rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(dk, dk_ref, rtol=1e-5, atol=1e-4)


def test_custom_vjp_forward_bit_identical_and_grads_match():
    rng = np.random.default_rng(0)
    shape = (2, 16, 8, 8)
    x = jnp.asarray(rng.standard_normal(shape), jnp.float32)
    k = jnp.asarray(rng.standard_normal((3, 3, 1, 8)) * 0.3, jnp.float32)

    y_ref = _plain(x, k)
    y = dwb.depthwise_conv3x3_fused_bwd(x, k)
    np.testing.assert_array_equal(np.asarray(y), np.asarray(y_ref))

    def loss_ref(x_, k_):
        return jnp.sum(jnp.sin(_plain(x_, k_)))

    def loss_fused(x_, k_):
        return jnp.sum(jnp.sin(dwb.depthwise_conv3x3_fused_bwd(x_, k_)))

    gx_ref, gk_ref = jax.grad(loss_ref, argnums=(0, 1))(x, k)
    gx, gk = jax.grad(loss_fused, argnums=(0, 1))(x, k)
    np.testing.assert_allclose(gx, gx_ref, rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(gk, gk_ref, rtol=1e-5, atol=1e-4)


def test_applicability_gate():
    ok = dwb.pallas_bwd_applicable
    # flagship block0-dw: in the envelope
    assert ok(240, 320, 32, (3, 3), (1, 1), (1, 1))
    # block2-dw C=144: measured LOSS, excluded
    assert not ok(120, 160, 144, (3, 3), (1, 1), (1, 1))
    # strided / dilated / non-3x3 / small-spatial: excluded
    assert not ok(240, 320, 32, (3, 3), (2, 2), (1, 1))
    assert not ok(240, 320, 32, (3, 3), (1, 1), (2, 2))
    assert not ok(240, 320, 32, (5, 5), (1, 1), (1, 1))
    assert not ok(48, 64, 32, (3, 3), (1, 1), (1, 1))
    # h=20: _row_tile's whole-H fallback (20) is <= 32 but not a multiple
    # of 8 — violates Mosaic's sublane constraint, must be excluded
    assert not ok(20, 800, 64, (3, 3), (1, 1), (1, 1))


def test_blocks_switch_param_compat():
    """DEPTHWISE_BWD_IMPL='pallas' must keep the flax param tree identical
    (checkpoint/import compatibility) and the forward bit-identical."""
    import flax.linen as nn

    class M(nn.Module):
        @nn.compact
        def __call__(self, x):
            return blocks.depthwise_conv(x, 3, 1, 1, name="dw")

    # big enough to satisfy the applicability gate: 128*256*32 > 1e6
    x = jnp.asarray(
        np.random.default_rng(0).standard_normal((1, 128, 256, 32)),
        jnp.float32,
    )
    v_xla = M().init(jax.random.key(0), x)
    blocks.set_depthwise_bwd_impl("pallas")
    try:
        v_pal = M().init(jax.random.key(0), x)
        assert jax.tree_util.tree_structure(v_xla) == (
            jax.tree_util.tree_structure(v_pal)
        )
        y_xla = M().apply(v_xla, x)
        y_pal = M().apply(v_pal, x)
        np.testing.assert_array_equal(np.asarray(y_xla), np.asarray(y_pal))
    finally:
        blocks.set_depthwise_bwd_impl("xla")


def test_blocks_switch_grads_match():
    """Gradient parity through the blocks-level switch (interpret mode)."""
    import flax.linen as nn

    class M(nn.Module):
        @nn.compact
        def __call__(self, x):
            return blocks.depthwise_conv(x, 3, 1, 1, name="dw")

    x = jnp.asarray(
        np.random.default_rng(1).standard_normal((1, 128, 256, 32)),
        jnp.float32,
    )
    v = M().init(jax.random.key(0), x)

    def loss(v_, x_):
        return jnp.sum(jnp.cos(M().apply(v_, x_)))

    g_ref = jax.grad(loss)(v, x)
    blocks.set_depthwise_bwd_impl("pallas")
    try:
        g_pal = jax.grad(loss)(v, x)
    finally:
        blocks.set_depthwise_bwd_impl("xla")
    k_ref = g_ref["params"]["dw"]["kernel"]
    k_pal = g_pal["params"]["dw"]["kernel"]
    np.testing.assert_allclose(k_pal, k_ref, rtol=1e-4, atol=1e-3)
