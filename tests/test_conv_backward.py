"""Parity of ops/conv_backward.conv2d_fast_wgrad vs XLA's conv gradients.

The fast path must be a pure lowering change: identical forward, identical
input gradient, and a weight gradient equal to XLA's up to float-summation
order (both are the same contraction with f32 accumulation).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ssdseglib_tpu.models import blocks
from ssdseglib_tpu.ops.conv_backward import _plain_conv, conv2d_fast_wgrad

CASES = [
    # (name, H, W, Cin, Cout, k, stride, dilation, groups)
    ("pointwise", 12, 16, 32, 16, 1, 1, 1, 1),
    ("dense3x3", 12, 16, 8, 24, 3, 1, 1, 1),
    ("dense3x3_s2_odd", 11, 13, 3, 32, 3, 2, 1, 1),
    ("dense3x3_dilated", 16, 16, 8, 8, 3, 1, 3, 1),
    ("depthwise3x3", 12, 16, 32, 32, 3, 1, 1, 32),
    ("depthwise3x3_s2", 11, 13, 16, 16, 3, 2, 1, 16),
]


@pytest.mark.parametrize("case", CASES, ids=[c[0] for c in CASES])
def test_fast_wgrad_matches_xla(case):
    _, H, W, Ci, Co, k, s, d, g = case
    rng = np.random.default_rng(7)
    B = 3
    x = jnp.asarray(rng.standard_normal((B, H, W, Ci)), jnp.float32)
    kernel = jnp.asarray(
        rng.standard_normal((k, k, Ci // g, Co)) * 0.2, jnp.float32
    )
    dy = jnp.asarray(
        rng.standard_normal((B, -(-H // s), -(-W // s), Co)), jnp.float32
    )

    def loss(conv_fn, x_, k_):
        return jnp.vdot(conv_fn(x_, k_, (s, s), (d, d), g), dy)

    y_fast = conv2d_fast_wgrad(x, kernel, (s, s), (d, d), g)
    y_ref = _plain_conv(x, kernel, (s, s), (d, d), g)
    np.testing.assert_array_equal(np.asarray(y_fast), np.asarray(y_ref))

    dx_f, dk_f = jax.grad(lambda a, b: loss(conv2d_fast_wgrad, a, b), (0, 1))(
        x, kernel
    )
    dx_r, dk_r = jax.grad(lambda a, b: loss(_plain_conv, a, b), (0, 1))(
        x, kernel
    )
    np.testing.assert_array_equal(np.asarray(dx_f), np.asarray(dx_r))
    np.testing.assert_allclose(
        np.asarray(dk_f), np.asarray(dk_r), rtol=1e-5, atol=1e-4
    )


def test_fast_wgrad_bf16():
    rng = np.random.default_rng(3)
    x = jnp.asarray(rng.standard_normal((2, 10, 12, 16)), jnp.bfloat16)
    kernel = jnp.asarray(
        rng.standard_normal((3, 3, 16, 8)) * 0.2, jnp.bfloat16
    )
    dy = jnp.asarray(rng.standard_normal((2, 10, 12, 8)), jnp.bfloat16)

    def loss(conv_fn, k_):
        return jnp.vdot(
            conv_fn(x, k_, (1, 1), (1, 1), 1).astype(jnp.float32),
            dy.astype(jnp.float32),
        )

    dk_f = jax.grad(lambda b: loss(conv2d_fast_wgrad, b))(kernel)
    dk_r = jax.grad(lambda b: loss(_plain_conv, b))(kernel)
    assert dk_f.dtype == jnp.bfloat16
    np.testing.assert_allclose(
        np.asarray(dk_f, dtype=np.float32),
        np.asarray(dk_r, dtype=np.float32),
        rtol=0.05,
        atol=0.05,
    )


def test_module_drop_in_is_impl_agnostic():
    """_FastWgradConv must produce identical params (names, shapes, values)
    and identical forward outputs to nn.Conv, so checkpoints and goldens
    are unaffected by the WGRAD_IMPL switch."""
    rng = np.random.default_rng(11)
    x = jnp.asarray(rng.standard_normal((2, 9, 11, 6)), jnp.float32)

    outs, params = {}, {}
    for impl in ("xla", "dot"):
        blocks.set_wgrad_impl(impl)
        try:
            mod = blocks.ConvBN(
                features=12, kernel_size=3, strides=2, relu_max=6.0,
                use_bias=True,
            )
            variables = mod.init(jax.random.key(0), x)
            outs[impl] = mod.apply(variables, x)
            params[impl] = variables["params"]
        finally:
            blocks.set_wgrad_impl("xla")

    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_array_equal(
            np.asarray(a), np.asarray(b)
        ),
        params["xla"],
        params["dot"],
    )
    np.testing.assert_array_equal(
        np.asarray(outs["xla"]), np.asarray(outs["dot"])
    )


def test_train_step_grads_match_across_impls():
    """End-to-end: a ConvBN+SepConvBN stack's parameter gradients under
    'fast' match across lowerings closely in f32."""
    rng = np.random.default_rng(5)
    x = jnp.asarray(rng.standard_normal((2, 12, 16, 4)), jnp.float32)
    target = jnp.asarray(rng.standard_normal((2, 6, 8, 8)), jnp.float32)

    import flax.linen as nn

    class Net(nn.Module):
        @nn.compact
        def __call__(self, x, train=True):
            x = blocks.ConvBN(features=16, kernel_size=3, strides=2,
                              relu_max=6.0, name="a")(x, train)
            x = blocks.SepConvBN(features=8, kernel_size=3, relu_max=0.0,
                                 name="b")(x, train)
            return x

    grads = {}
    for impl in ("xla", "dot"):
        blocks.set_wgrad_impl(impl)
        try:
            net = Net()
            variables = net.init(jax.random.key(1), x)

            def loss_fn(p):
                out, _ = net.apply(
                    {"params": p, "batch_stats": variables["batch_stats"]},
                    x, train=True, mutable=["batch_stats"],
                )
                return jnp.mean((out - target) ** 2)

            grads[impl] = jax.grad(loss_fn)(variables["params"])
        finally:
            blocks.set_wgrad_impl("xla")

    flat_x = jax.tree_util.tree_leaves_with_path(grads["xla"])
    flat_f = dict(
        (jax.tree_util.keystr(k), v)
        for k, v in jax.tree_util.tree_leaves_with_path(grads["dot"])
    )
    assert flat_x
    for path, leaf in flat_x:
        np.testing.assert_allclose(
            np.asarray(leaf),
            np.asarray(flat_f[jax.tree_util.keystr(path)]),
            rtol=2e-5,
            atol=1e-5,
            err_msg=jax.tree_util.keystr(path),
        )
