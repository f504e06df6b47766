"""Parity: fused s2d stem/block1 Pallas kernel vs the plain XLA folded path.

The kernel re-indexes the stride-2 stem conv into space-to-depth form and
batch-packs 4 images per 128-lane group (ops/s2d_stem.py); both transforms
are weight-preserving, so outputs must match the reference composition
stem(expand s2 -> dw -> project) + block1(expand -> dw s2 -> project)
(reference models.py:196-210, BN already folded) to float tolerance.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ssdseglib_tpu.models.fused_inference import _conv
from ssdseglib_tpu.ops.s2d_stem import (
    fused_s2d_stem_block1,
    s2d_stem_block1_xla,
)


def make_folded(rng):
    def k(*shape):
        return rng.normal(0, 0.4, shape).astype(np.float32)

    return {
        "backbone-block0-expand": (k(3, 3, 3, 32), k(32)),
        "backbone-block0-depthwise": (k(3, 3, 1, 32), k(32)),
        "backbone-block0-project": (k(1, 1, 32, 16), k(16)),
        "backbone-block1-expand": (k(1, 1, 16, 96), k(96)),
        "backbone-block1-depthwise": (k(3, 3, 1, 96), k(96)),
        "backbone-block1-project": (k(1, 1, 96, 24), k(24)),
    }


def reference_stem_block1(folded, x):
    (we, be) = folded["backbone-block0-expand"]
    (wd, bd) = folded["backbone-block0-depthwise"]
    (wp, bp) = folded["backbone-block0-project"]
    x = _conv(x, we, be, stride=2, relu6=True)
    x = _conv(x, wd, bd, depthwise=True, relu6=True)
    x = _conv(x, wp, bp)
    (we, be) = folded["backbone-block1-expand"]
    (wd, bd) = folded["backbone-block1-depthwise"]
    (wp, bp) = folded["backbone-block1-project"]
    e = _conv(x, we, be, relu6=True)
    d = _conv(e, wd, bd, stride=2, depthwise=True, relu6=True)
    return _conv(d, wp, bp)


@pytest.mark.parametrize(
    "batch,height,width,row_tile",
    [(4, 32, 32, 4), (8, 48, 64, 4), (4, 64, 32, 8)],
)
def test_s2d_stem_block1_parity(batch, height, width, row_tile):
    rng = np.random.default_rng(height + width)
    folded = make_folded(rng)
    x = jnp.asarray(
        rng.uniform(-1, 1, (batch, height, width, 3)).astype(np.float32)
    )
    want = reference_stem_block1(folded, x)
    got = fused_s2d_stem_block1(x, folded, row_tile=row_tile, interpret=True)
    assert got.shape == want.shape == (batch, height // 4, width // 4, 24)
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(want), rtol=2e-5, atol=2e-5
    )


@pytest.mark.parametrize("batch,height,width", [(4, 32, 32), (8, 48, 64)])
def test_s2d_stem_block1_xla_parity(batch, height, width):
    """The XLA-conv formulation of the same s2d+batch-pack transform."""
    rng = np.random.default_rng(height * 3 + width)
    folded = make_folded(rng)
    x = jnp.asarray(
        rng.uniform(-1, 1, (batch, height, width, 3)).astype(np.float32)
    )
    want = reference_stem_block1(folded, x)
    got = s2d_stem_block1_xla(x, folded)
    assert got.shape == want.shape
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(want), rtol=2e-5, atol=2e-5
    )


def test_s2d_stem_block1_bf16():
    """bf16 like serving: compare against the XLA folded path run in bf16
    too (same storage dtype; the kernel accumulates matmuls in f32 so a
    small advantage over pure-bf16 XLA convs is expected)."""
    rng = np.random.default_rng(0)
    folded = make_folded(rng)
    x = rng.uniform(-1, 1, (4, 96, 128, 3)).astype(np.float32)
    want_f32 = np.asarray(reference_stem_block1(folded, jnp.asarray(x)))
    got = np.asarray(
        fused_s2d_stem_block1(
            jnp.asarray(x, jnp.bfloat16), folded, row_tile=4, interpret=True
        ),
        np.float32,
    )
    # the honest bar: the kernel's deviation from f32 truth must not
    # exceed the XLA path's own bf16 deviation (same storage precision)
    folded_bf = {
        k: (jnp.asarray(a, jnp.bfloat16), jnp.asarray(b, jnp.bfloat16))
        for k, (a, b) in folded.items()
    }
    xla_bf = np.asarray(
        reference_stem_block1(folded_bf, jnp.asarray(x, jnp.bfloat16)),
        np.float32,
    )
    scale = np.maximum(np.abs(want_f32), 1.0)
    err_kernel = np.abs(got - want_f32) / scale
    err_xla = np.abs(xla_bf - want_f32) / scale
    assert err_kernel.mean() <= err_xla.mean() * 1.2
    assert np.quantile(err_kernel, 0.999) <= max(
        np.quantile(err_xla, 0.999) * 1.5, 0.05
    )


def test_s2d_stem_value_validation():
    """Typos like 'palas' and misaligned row tiles fail loudly
    (ADVICE r2)."""
    import numpy as np
    import pytest

    from ssdseglib_tpu.models import fused_inference as fi
    from ssdseglib_tpu.ops import s2d_stem as s2d

    folded = {}
    x = np.zeros((4, 32, 32, 3), np.float32)
    with pytest.raises(ValueError, match="s2d_stem"):
        fi.mobilenetv2_features_fused(folded, x, s2d_stem="palas")
    with pytest.raises(ValueError, match="s2d_row_tile"):
        fi.mobilenetv2_features_fused(
            folded, x, s2d_stem="pallas", s2d_row_tile=3
        )
    with pytest.raises(AssertionError, match="row_tile"):
        s2d.fused_s2d_stem_block1(x, folded, row_tile=3)
