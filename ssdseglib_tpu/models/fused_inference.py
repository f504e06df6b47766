"""Fused-backbone inference path for MobileNetV2.

Serving-time alternative to the Flax backbone: every ConvBN is folded to
conv+bias host-side, the stem and stride-2 blocks run as plain XLA convs,
and each stride-1 inverted-residual repeat runs as one fused Pallas
program with the expanded tensor resident in VMEM (ops/fused_mbconv.py —
up to 1.9x per block on v5e).  Numerically equivalent to the standard
path at bf16 rounding level; verified in tests/test_fused_inference.py.
"""

from __future__ import annotations

from typing import Dict, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ssdseglib_tpu.config import ModelConfig
from ssdseglib_tpu.models.mobilenetv2 import _SEQUENCES
from ssdseglib_tpu.ops.fused_mbconv import fold_conv_bn, fused_mbconv


def _fold(params, stats, name: str):
    p, s = params[name], stats[name]
    return fold_conv_bn(
        p["conv"]["kernel"], p["batchnorm"]["scale"], p["batchnorm"]["bias"],
        s["batchnorm"]["mean"], s["batchnorm"]["var"],
    )


def fold_mobilenetv2(variables) -> Dict[str, Tuple[np.ndarray, np.ndarray]]:
    """Fold every backbone ConvBN into (kernel, bias), keyed by block name."""
    params = variables["params"]["backbone"]
    stats = variables["batch_stats"]["backbone"]
    folded = {}
    for name in params:
        folded[name] = _fold(params, stats, name)
    return folded


def _conv(x, kernel, bias, stride: int = 1, depthwise: bool = False,
          relu6: bool = False):
    """Folded conv + bias (+ relu6), NHWC/HWIO, SAME padding."""
    kernel = jnp.asarray(kernel, x.dtype)
    groups = x.shape[-1] if depthwise else 1
    y = jax.lax.conv_general_dilated(
        x, kernel, (stride, stride), "SAME",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        feature_group_count=groups,
    )
    y = y + jnp.asarray(bias, x.dtype)
    if relu6:
        y = jnp.minimum(jnp.maximum(y, 0.0), 6.0)
    return y


def _s2d_stem_applicable(x: jnp.ndarray, row_tile: int) -> bool:
    """Shape gate for the batch-packed s2d stem/block1 kernel."""
    B, H, W = x.shape[:3]
    return (
        B % 4 == 0
        and H % (4 * row_tile) == 0
        and W % 4 == 0
        and (H // 2) % (2 * row_tile) == 0
    )


def mobilenetv2_features_fused(
    folded: Dict[str, Tuple[np.ndarray, np.ndarray]],
    x: jnp.ndarray,
    interpret: bool = False,
    s2d_stem=False,
    s2d_row_tile: int = 4,
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Backbone forward on pre-scaled input ([-1, 1]); returns the three
    head taps (fm1 os16, fm2 os32, skip os4).

    s2d_stem: run stem + block1 through the batch-packed space-to-depth
    reformulation (ops/s2d_stem.py) when the input shape allows it.
    'xla' uses the conv formulation; 'pallas' the single fused kernel.
    Default OFF: measured on v5e (docs/PERFORMANCE.md round 2), BOTH
    variants lose to XLA's own lowering of the plain stem (15.8 / 18.1 ms
    vs 12.0 ms batch-16 forward) — kept as a verified-correct experiment
    and for future hardware where the trade-off may differ."""

    def block_convs(block: int):
        return (
            folded[f"backbone-block{block}-expand"],
            folded[f"backbone-block{block}-depthwise"],
            folded[f"backbone-block{block}-project"],
        )

    if s2d_stem not in (False, "xla", "pallas"):
        # reject typos like 'palas' / True instead of silently falling
        # through to a different variant (ADVICE r2)
        raise ValueError(
            f"s2d_stem must be False, 'xla' or 'pallas'; got {s2d_stem!r}"
        )
    if s2d_stem == "pallas" and s2d_row_tile % 4 != 0:
        raise ValueError(
            f"s2d_row_tile must be a multiple of 4 (pallas tail-block "
            f"alignment), got {s2d_row_tile}"
        )
    use_s2d = s2d_stem and _s2d_stem_applicable(
        x, s2d_row_tile if s2d_stem == "pallas" else 1
    )
    if use_s2d and s2d_stem == "pallas":
        from ssdseglib_tpu.ops.s2d_stem import fused_s2d_stem_block1

        x = fused_s2d_stem_block1(
            x, folded, row_tile=s2d_row_tile, interpret=interpret
        )
    elif use_s2d:
        from ssdseglib_tpu.ops.s2d_stem import s2d_stem_block1_xla

        x = s2d_stem_block1_xla(x, folded)
    else:
        # stem (block 0) + block1 as plain XLA convs
        (we, be), (wd, bd), (wp, bp) = block_convs(0)
        x = _conv(x, we, be, stride=2, relu6=True)
        x = _conv(x, wd, bd, depthwise=True, relu6=True)
        x = _conv(x, wp, bp)

    taps = {}
    block = 0
    for expansion, channels_out, n_repeat, stride in _SEQUENCES:
        for n in range(n_repeat):
            block += 1
            if block == 1 and use_s2d:
                continue  # already inside the s2d kernel
            (we, be), (wd, bd), (wp, bp) = block_convs(block)
            if n == 0:
                # stride-s first block, no residual: XLA convs; expose the
                # expand activation (head taps live on first blocks)
                e = _conv(x, we, be, relu6=True)
                taps[f"block{block}-expand"] = e
                d = _conv(e, wd, bd, stride=stride, depthwise=True, relu6=True)
                x = _conv(d, wp, bp)
            else:
                # stride-1 residual repeat: one fused Pallas program
                x = fused_mbconv(
                    x, we, be, wd, bd, wp, bp, residual=True,
                    interpret=interpret,
                )
        taps[f"block{block}-out"] = x

    fm1 = taps["block13-expand"]  # os16 (backbone-block13-expand-relu6)
    fm2 = taps["block16-out"]  # os32 (backbone-block16-project-batchnorm)
    skip = taps["block3-expand"]  # os4 (backbone-block3-expand-relu6)
    return fm1, fm2, skip


def make_fused_forward(cfg: ModelConfig, variables, compute_dtype=jnp.bfloat16,
                       interpret: bool = False, s2d_stem=False,
                       s2d_row_tile: int = 4):
    """Build a fused-backbone forward with the same signature/outputs as
    `SsdSegModel.apply(variables, images, train=False)`."""
    from ssdseglib_tpu.models.builder import SsdSegHeads

    if cfg.backbone != "mobilenetv2":
        raise ValueError("fused inference currently supports mobilenetv2 only")

    folded = {
        name: (jnp.asarray(k, compute_dtype), jnp.asarray(b, compute_dtype))
        for name, (k, b) in fold_mobilenetv2(variables).items()
    }
    heads = SsdSegHeads(cfg=cfg)
    head_keys = [k for k in variables["params"] if k != "backbone"]
    heads_vars = {
        "params": {k: variables["params"][k] for k in head_keys},
        "batch_stats": {
            k: variables["batch_stats"][k]
            for k in variables["batch_stats"]
            if k != "backbone"
        },
    }
    heads_vars = jax.tree_util.tree_map(
        lambda a: jnp.asarray(a, compute_dtype), heads_vars
    )

    def forward(images):
        x = images.astype(compute_dtype) / 127.5 - 1.0
        fm1, fm2, skip = mobilenetv2_features_fused(
            folded, x, interpret=interpret, s2d_stem=s2d_stem,
            s2d_row_tile=s2d_row_tile,
        )
        return heads.apply(heads_vars, fm1, fm2, skip, train=False)

    return forward
