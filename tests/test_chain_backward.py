"""Whole-chain fused Pallas backward (ops/fused_chain_backward.py):
forward parity with the plain flax DepthwiseConvBN and gradient parity
with `jax.vjp` of the plain composition, in Pallas interpret mode (the
suite runs on CPU; the kernel itself is measured on TPU —
tests/tpu_scripts/chain_bwd_ab.py)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from ssdseglib_tpu.models import blocks as blocks_lib
from ssdseglib_tpu.models.blocks import DepthwiseConvBN
from ssdseglib_tpu.ops.fused_chain_backward import (
    chain_applicable,
    dw_bn_relu6_chain,
)

# chain_applicable demands h*w*c >= 1M; parity tests force the chain
# branch explicitly on small shapes instead (the envelope gate is a perf
# heuristic, not a correctness bound)
B, H, W, C = 2, 16, 24, 8


def _params(key, dtype):
    k1, k2, k3, k4 = jax.random.split(key, 4)
    return (
        jax.random.normal(k1, (B, H, W, C), dtype) * 2.0,
        (jax.random.normal(k2, (3, 3, 1, C), jnp.float32) * 0.5).astype(dtype),
        (1.0 + 0.1 * jax.random.normal(k3, (C,), jnp.float32)).astype(dtype),
        (0.1 * jax.random.normal(k4, (C,), jnp.float32)).astype(dtype),
    )


def _plain_chain(x, kernel, gamma, beta):
    """The reference composition: dw conv + train BN + ReLU6, written with
    the same flax semantics the model uses (fast variance, f32 stats,
    cast-then-relu)."""
    u = jax.lax.conv_general_dilated(
        x, kernel, (1, 1), "SAME",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        feature_group_count=C,
    )
    u32 = u.astype(jnp.float32)
    mean = jnp.mean(u32, axis=(0, 1, 2))
    var = jnp.maximum(jnp.mean(u32 * u32, axis=(0, 1, 2)) - mean * mean, 0.0)
    inv = jax.lax.rsqrt(var + 1e-3)
    z = ((u32 - mean) * (inv * gamma.astype(jnp.float32))
         + beta.astype(jnp.float32)).astype(u.dtype)
    return jnp.minimum(jax.nn.relu(z), jnp.array(6, z.dtype))


@pytest.mark.parametrize("dtype", [jnp.float32, jnp.bfloat16])
def test_chain_forward_and_grads_match_vjp(dtype):
    x, kernel, gamma, beta = _params(jax.random.key(0), dtype)

    y_ref, vjp_ref = jax.vjp(_plain_chain, x, kernel, gamma, beta)
    y_fused, mean, var = dw_bn_relu6_chain(x, kernel, gamma, beta)
    np.testing.assert_array_equal(np.asarray(y_fused), np.asarray(y_ref))
    assert mean.dtype == jnp.float32 and var.dtype == jnp.float32

    dy = jax.random.normal(jax.random.key(1), y_ref.shape, jnp.float32).astype(
        dtype
    )
    dx_ref, dk_ref, dg_ref, db_ref = vjp_ref(dy)

    def fused_scalar(x, kernel, gamma, beta):
        y, m, v = dw_bn_relu6_chain(x, kernel, gamma, beta)
        return jnp.sum(y.astype(jnp.float32) * dy.astype(jnp.float32))

    def ref_scalar(x, kernel, gamma, beta):
        return jnp.sum(
            _plain_chain(x, kernel, gamma, beta).astype(jnp.float32)
            * dy.astype(jnp.float32)
        )

    g_fused = jax.grad(fused_scalar, argnums=(0, 1, 2, 3))(
        x, kernel, gamma, beta
    )
    g_ref = jax.grad(ref_scalar, argnums=(0, 1, 2, 3))(x, kernel, gamma, beta)
    tol = dict(rtol=2e-2, atol=2e-2) if dtype == jnp.bfloat16 else dict(
        rtol=2e-4, atol=2e-5
    )
    for got, want, name in zip(g_fused, g_ref, ("dx", "dk", "dgamma", "dbeta")):
        np.testing.assert_allclose(
            np.asarray(got, np.float32), np.asarray(want, np.float32),
            err_msg=name, **tol,
        )


def test_chain_module_branch_matches_plain_module():
    """DepthwiseConvBN with the chain impl ON: identical forward values,
    identical running-stats update, close gradients vs the default impl,
    and the SAME parameter tree (checkpoint compatibility)."""
    # big enough to pass the envelope gate: 64*64*32 = 131k < 1M — gate
    # would reject; monkeypatch around it by testing through the op
    # directly above, and the module branch on an in-envelope shape here
    b, h, w, c = 1, 128, 256, 32  # h*w*c = 1.05M, tile 32 legal
    mod = DepthwiseConvBN(strides=1, relu_max=6.0)
    x = jax.random.normal(jax.random.key(2), (b, h, w, c), jnp.float32)
    variables = mod.init(jax.random.key(3), x, train=True)

    def run(impl):
        blocks_lib.set_chain_bwd_impl(impl)
        try:
            y, mut = mod.apply(
                variables, x, train=True, mutable=["batch_stats"]
            )

            def loss(v):
                out, _ = mod.apply(
                    {"params": v, "batch_stats": variables["batch_stats"]},
                    x, train=True, mutable=["batch_stats"],
                )
                return jnp.sum(out * out)

            grads = jax.grad(loss)(variables["params"])
            return y, mut, grads
        finally:
            blocks_lib.set_chain_bwd_impl("xla")

    y_plain, mut_plain, g_plain = run("xla")
    y_chain, mut_chain, g_chain = run("pallas")

    np.testing.assert_allclose(
        np.asarray(y_chain), np.asarray(y_plain), rtol=1e-5, atol=1e-5
    )
    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=1e-4, atol=1e-6
        ),
        mut_chain, mut_plain,
    )
    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=5e-3, atol=5e-4
        ),
        g_chain, g_plain,
    )
    # identical tree structure either way
    assert jax.tree_util.tree_structure(
        mod.init(jax.random.key(4), x, train=True)
    ) == jax.tree_util.tree_structure(variables)


def test_chain_applicable_envelope():
    ok = dict(kernel_size=(3, 3), strides=(1, 1), dilation=(1, 1),
              relu_max=6.0)
    assert chain_applicable(240, 320, 32, **ok)
    assert not chain_applicable(240, 320, 32, (3, 3), (2, 2), (1, 1), 6.0)
    assert not chain_applicable(240, 320, 32, (3, 3), (1, 1), (1, 1), None)
    assert not chain_applicable(120, 160, 144, **ok)  # C > 64
    assert not chain_applicable(8, 8, 8, **ok)        # too small to matter
