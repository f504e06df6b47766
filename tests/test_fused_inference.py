"""Fused-backbone inference path parity vs the standard Flax path."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ssdseglib_tpu.config import ModelConfig
from ssdseglib_tpu.models.builder import SsdSegModel
from ssdseglib_tpu.models.fused_inference import make_fused_forward

CFG = ModelConfig(
    input_image_shape=(96, 128, 3),
    number_of_classes=4,
    boxes_per_point=(6, 6, 6, 6),
    backbone="mobilenetv2",
    segmentation_dilation_rates=(3, 6, 12),
)


@pytest.fixture(scope="module")
def setup():
    module = SsdSegModel(cfg=CFG)
    variables = module.init(
        jax.random.key(0), jnp.zeros((1, 96, 128, 3)), train=False
    )
    # non-trivial BN stats so folding matters
    rng = np.random.default_rng(0)
    stats = jax.tree_util.tree_map(
        lambda x: jnp.asarray(rng.uniform(0.5, 1.5, x.shape).astype(np.float32)),
        variables["batch_stats"],
    )
    return module, {"params": variables["params"], "batch_stats": stats}


def test_fused_forward_matches_standard(setup):
    module, variables = setup
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.uniform(0, 255, (2, 96, 128, 3)).astype(np.float32))

    expected = module.apply(variables, x, train=False)
    fused = make_fused_forward(
        CFG, variables, compute_dtype=jnp.float32, interpret=True
    )
    got = fused(x)

    for key in expected:
        np.testing.assert_allclose(
            np.asarray(got[key]), np.asarray(expected[key]),
            rtol=2e-3, atol=2e-3, err_msg=key,
        )


@pytest.mark.parametrize("mode", ["pallas", "xla"])
def test_fused_forward_s2d_stem_matches_standard(setup, mode):
    """The batch-packed s2d stem/block1 reformulations (ops/s2d_stem.py,
    opt-in) must still match the Flax path end-to-end."""
    module, variables = setup
    rng = np.random.default_rng(2)
    x = jnp.asarray(rng.uniform(0, 255, (4, 96, 128, 3)).astype(np.float32))

    expected = module.apply(variables, x, train=False)
    fused = make_fused_forward(
        CFG, variables, compute_dtype=jnp.float32, interpret=True,
        s2d_stem=mode,
    )
    got = fused(x)

    for key in expected:
        np.testing.assert_allclose(
            np.asarray(got[key]), np.asarray(expected[key]),
            rtol=2e-3, atol=2e-3, err_msg=key,
        )


def test_fused_forward_rejects_shufflenet(setup):
    _, variables = setup
    cfg = ModelConfig(backbone="shufflenetv2")
    with pytest.raises(ValueError):
        make_fused_forward(cfg, variables)
