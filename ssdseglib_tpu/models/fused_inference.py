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
          relu6: bool = False, dilation: int = 1):
    """Folded conv + bias (+ relu6), NHWC/HWIO, SAME padding."""
    kernel = jnp.asarray(kernel, x.dtype)
    groups = x.shape[-1] if depthwise else 1
    y = jax.lax.conv_general_dilated(
        x, kernel, (stride, stride), "SAME",
        rhs_dilation=(dilation, dilation),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        feature_group_count=groups,
    )
    if bias is not None:
        y = y + jnp.asarray(bias, x.dtype)
    if relu6:
        y = jnp.minimum(jnp.maximum(y, 0.0), 6.0)
    return y


def _quantize_weight_int8(kernel):
    """Per-output-channel symmetric int8 weight quantization.

    kernel: (kh, kw, Ci, Co) f32 -> (int8 kernel, (Co,) f32 dequant scale).
    """
    k = np.asarray(kernel, np.float32)
    amax = np.max(np.abs(k), axis=(0, 1, 2))
    scale = np.where(amax > 0, amax / 127.0, 1.0).astype(np.float32)
    kq = np.clip(np.round(k / scale), -127, 127).astype(np.int8)
    return kq, scale


def _conv_int8(x, kq, w_scale, x_scale, bias):
    """Pointwise conv in s8 x s8 -> s32 on the int8 MXU rate, with the
    quantize / dequantize steps fused into the neighbouring XLA fusions.

    Why int8 here and only here: XLA reaches the v5e 2x int8 MXU rate on
    1x1/matmul-shaped convs but NOT on the dominant 3x3 mask-decoder conv
    (measured: tests/tpu_scripts/int8_conv_probe.py, docs/PERFORMANCE.md
    round-3 int8 feasibility).  Weights are per-output-channel symmetric;
    activations per-tensor symmetric with a calibration-time static scale.
    """
    xq = jnp.clip(
        jnp.round(x.astype(jnp.float32) * (1.0 / x_scale)), -127.0, 127.0
    ).astype(jnp.int8)
    y = jax.lax.conv_general_dilated(
        xq, kq, (1, 1), "SAME",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=jnp.int32,
    )
    y = y.astype(jnp.float32) * (
        jnp.asarray(w_scale, jnp.float32) * jnp.float32(x_scale)
    )
    if bias is not None:
        y = y + jnp.asarray(bias, jnp.float32)
    return y.astype(x.dtype)


# Pointwise convs worth quantizing (measured int8 >= 1.3x standalone):
# the ASPP input pointwise (1x1 576->256 @30x40, 1.65x) and the decoder
# SepConv pointwise (1x1 256->256 @120x160, 1.39x).  Everything else
# either shows no int8 speedup (3x3 convs) or is too small to matter.
QUANT_TARGETS = ("mask-encoder/aspp-pointwise", "mask-decoder/sepconv-pw")


def quantize_pointwise_weights(folded_heads_f32):
    """Build the int8 weight tables for QUANT_TARGETS from the f32 folded
    heads: {target: (int8 kernel, (Co,) w_scale, f32 bias)}."""
    k1, b1 = folded_heads_f32["mask-encoder/aspp-pointwise"]
    _, pw2, b2 = folded_heads_f32["mask-decoder/sepconv"]
    out = {}
    kq, ws = _quantize_weight_int8(k1)
    out["mask-encoder/aspp-pointwise"] = (kq, ws, np.asarray(b1, np.float32))
    kq, ws = _quantize_weight_int8(pw2)
    out["mask-decoder/sepconv-pw"] = (kq, ws, np.asarray(b2, np.float32))
    return out


def _act(x, relu_max):
    """Reference activation convention (models/blocks.py): None = no
    activation, 0.0 = uncapped ReLU, > 0 = capped ReLU."""
    if relu_max is None:
        return x
    x = jnp.maximum(x, 0.0)
    if relu_max > 0.0:
        x = jnp.minimum(x, relu_max)
    return x


def _fold_convbn_tree(p, s):
    return fold_conv_bn(
        p["conv"]["kernel"], p["batchnorm"]["scale"], p["batchnorm"]["bias"],
        s["batchnorm"]["mean"], s["batchnorm"]["var"],
    )


def _fold_sepconv_tree(p, s):
    """SepConvBN: BN sits after the pointwise conv only (Keras
    SeparableConv2D semantics, reference blocks.py:152-154) — fold it into
    the pointwise kernel; the depthwise kernel passes through untouched."""
    pw, bias = fold_conv_bn(
        p["pointwise"]["kernel"], p["batchnorm"]["scale"],
        p["batchnorm"]["bias"], s["batchnorm"]["mean"], s["batchnorm"]["var"],
    )
    return np.asarray(p["depthwise"]["kernel"], np.float32), pw, bias


def fold_heads(variables, cfg: ModelConfig) -> Dict[str, tuple]:
    """Fold every head-side ConvBN / SepConvBN into conv + bias, keyed by
    '/'-joined parameter path.  Mirrors `fold_mobilenetv2` for the heads
    (extra pyramid blocks, ASPP encoder, DeepLabV3+ decoder, SSDLite
    branches — reference blocks.py:4-157, models.py:217-312)."""
    from ssdseglib_tpu.models.builder import _backbone_head_config

    p0, s0 = variables["params"], variables["batch_stats"]
    _, extra = _backbone_head_config(cfg)
    out = {}

    def convbn(*path):
        p = p0
        s = s0
        for key in path:
            p, s = p[key], s[key]
        out["/".join(path)] = _fold_convbn_tree(p, s)

    def sepconv(*path):
        p = p0
        s = s0
        for key in path:
            p, s = p[key], s[key]
        out["/".join(path)] = _fold_sepconv_tree(p, s)

    sepconv(extra[0][1])
    sepconv(extra[1][1])
    convbn("mask-encoder", "aspp-pointwise")
    for i in range(len(cfg.segmentation_dilation_rates)):
        sepconv("mask-encoder", f"aspp-atrous{i + 1}")
    convbn("mask-encoder", "pooling")
    convbn("mask-encoder", "output")
    convbn("mask-decoder", "backbone-reduce")
    convbn("mask-decoder", "conv")
    sepconv("mask-decoder", "sepconv")
    out["mask-decoder/output-conv"] = (
        np.asarray(p0["mask-decoder"]["output-conv"]["kernel"], np.float32),
    )
    for i in range(4):
        sepconv("heads", f"labels{i + 1}", "sepconv")
        sepconv("heads", f"boxes{i + 1}", "sepconv")
    return out


def heads_forward_folded(cfg: ModelConfig, folded: Dict[str, tuple],
                         fm1, fm2, skip, quant=None, collect_amax=False):
    """BN-folded, concat-free forward of the task heads.

    Numerically equivalent (at folding/rounding level) to
    `SsdSegHeads.apply(..., train=False)` but shaped for the TPU memory
    system: every ConvBN runs as conv+bias, and each `concat -> conv`
    pair (the ASPP merge, reference blocks.py:64-66, and the decoder skip
    merge, blocks.py:113-117) is reformulated as a sum of per-branch convs
    over kernel slices — the (B, H, W, sum(C_i)) concatenation is never
    materialized (it alone was ~0.6 ms/batch-16 of HBM traffic on v5e,
    docs/PERFORMANCE.md round 3)."""
    from ssdseglib_tpu.models.blocks import bilinear_resize
    from ssdseglib_tpu.models.builder import _backbone_head_config

    relu_max, extra = _backbone_head_config(cfg)

    def sep(x, name, stride=1, dilation=1, rm=relu_max):
        dw, pw, b = folded[name]
        y = _conv(x, dw, None, stride=stride, depthwise=True,
                  dilation=dilation)
        return _act(_conv(y, pw, b), rm)

    fm3 = sep(fm2, extra[0][1], stride=2)
    fm4 = sep(fm3, extra[1][1], stride=2)

    # -- ASPP encoder (reference blocks.py:4-74): the output pointwise conv
    # over the 5-branch concat runs as 5 sliced matmuls summed; the pooled
    # branch's contribution is spatially constant, so it enters as a bias.
    amaxes = {}
    if collect_amax:
        amaxes["mask-encoder/aspp-pointwise"] = jnp.max(jnp.abs(fm1))
    if quant and "mask-encoder/aspp-pointwise" in quant:
        pw_out = _act(
            _conv_int8(fm1, *quant["mask-encoder/aspp-pointwise"]), relu_max
        )
    else:
        pw_out = _act(
            _conv(fm1, *folded["mask-encoder/aspp-pointwise"]), relu_max
        )
    atrous = [
        sep(fm1, f"mask-encoder/aspp-atrous{i + 1}", dilation=rate)
        for i, rate in enumerate(cfg.segmentation_dilation_rates)
    ]
    pooled = jnp.mean(fm1, axis=(1, 2), keepdims=True)
    pooled = _act(_conv(pooled, *folded["mask-encoder/pooling"]), relu_max)
    ko, bo = folded["mask-encoder/output"]  # (1, 1, 5F, F)
    F = ko.shape[-1]
    enc = _conv(pw_out, ko[:, :, :F], None)
    for i, branch in enumerate(atrous):
        enc = enc + _conv(branch, ko[:, :, (i + 1) * F:(i + 2) * F], None)
    enc = enc + _conv(pooled, ko[:, :, (len(atrous) + 1) * F:], bo)
    enc = _act(enc, relu_max)

    # -- DeepLabV3+ decoder (reference blocks.py:76-132): the 3x3 conv over
    # concat([upsampled encoder, reduced skip]) runs as two sliced convs.
    enc_up = bilinear_resize(enc, skip.shape[1], skip.shape[2])
    red = _act(_conv(skip, *folded["mask-decoder/backbone-reduce"]), relu_max)
    kc, bc = folded["mask-decoder/conv"]  # (3, 3, F + 48, F)
    x = _conv(enc_up, kc[:, :, :F], None) + _conv(red, kc[:, :, F:], bc)
    x = _act(x, relu_max)
    # decoder SepConv, split so the pointwise half can run int8
    dw_k, pw_k, b_sep = folded["mask-decoder/sepconv"]
    dw_out = _conv(x, dw_k, None, depthwise=True)
    if collect_amax:
        amaxes["mask-decoder/sepconv-pw"] = jnp.max(jnp.abs(dw_out))
    if quant and "mask-decoder/sepconv-pw" in quant:
        x = _act(_conv_int8(dw_out, *quant["mask-decoder/sepconv-pw"]),
                 relu_max)
    else:
        x = _act(_conv(dw_out, pw_k, b_sep), relu_max)
    (k_out,) = folded["mask-decoder/output-conv"]
    x = _conv(x, k_out, None)
    x = bilinear_resize(x, cfg.input_image_shape[0], cfg.input_image_shape[1])
    mask = jax.nn.softmax(x, axis=-1)

    # -- SSDLite branches (reference models.py:246-273, incl. the 4 /
    # num_classes channel-swap quirk inherited from the Flax heads)
    head_rm = (
        cfg.detection_head_relu_max
        if cfg.detection_head_relu_max is not None
        else relu_max
    )
    fms = [fm1, fm2, fm3, fm4]
    b = fm1.shape[0]
    labels = jnp.concatenate(
        [
            sep(fm, f"heads/labels{i + 1}/sepconv", rm=head_rm).reshape(
                b, -1, 4
            )
            for i, fm in enumerate(fms)
        ],
        axis=1,
    )
    labels = jax.nn.softmax(labels, axis=-1)
    boxes = jnp.concatenate(
        [
            sep(fm, f"heads/boxes{i + 1}/sepconv", rm=head_rm).reshape(
                b, -1, cfg.number_of_classes
            )
            for i, fm in enumerate(fms)
        ],
        axis=1,
    )
    outputs = {"output-mask": mask, "output-labels": labels,
               "output-boxes": boxes}
    if collect_amax:
        return outputs, amaxes
    return outputs


def fold_stem_rescale(kernel, bias, input_hw):
    """Fold the [0,255] -> [-1,1] input rescale (reference models.py:187)
    into the (already BN-folded) stem conv.

    conv_SAME(x/127.5 - 1, k) + b == conv_SAME(x, k/127.5) + (b - ones(x)*k)
    where the correction term `conv_SAME(ones, k)` varies only near the
    borders (SAME zero-padding of the RESCALED image means gray padding of
    the raw one); it is precomputed here as a (1, H/2, W/2, C) bias map.
    Lets the serving program consume the uint8 input directly — the
    standalone rescale fusion previously forced a full-size layout copy
    (0.45 ms/batch-16 on v5e, docs/PERFORMANCE.md round 3)."""
    k = np.asarray(kernel, np.float32)
    h, w = int(input_hw[0]), int(input_hw[1])
    kh, kw = k.shape[:2]
    stride = 2
    hout, wout = -(-h // stride), -(-w // stride)
    pad_t = max((hout - 1) * stride + kh - h, 0) // 2
    pad_l = max((wout - 1) * stride + kw - w, 0) // 2
    # corr[ho, wo, o] = sum over in-bounds taps of k summed over in-channels
    # (pure NumPy: folding must not trigger a remote TPU compile)
    ksum = k.sum(axis=2)  # (kh, kw, C_out)
    hi = np.arange(hout) * stride - pad_t
    wi = np.arange(wout) * stride - pad_l
    corr = np.zeros((hout, wout, k.shape[3]), np.float32)
    for dh in range(kh):
        vh = ((hi + dh >= 0) & (hi + dh < h)).astype(np.float32)
        for dw in range(kw):
            vw = ((wi + dw >= 0) & (wi + dw < w)).astype(np.float32)
            corr += ksum[dh, dw] * (vh[:, None] * vw[None, :])[..., None]
    bias_map = np.asarray(bias, np.float32) - corr[None]
    return k / 127.5, bias_map  # bias_map: (1, hout, wout, C_out)


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


def calibrate_pointwise_scales(cfg: ModelConfig, variables, images,
                               interpret: bool = False,
                               compute_dtype=jnp.bfloat16):
    """One pass of the folded pipeline over calibration images in the
    SERVING compute dtype (the fused Pallas MBConv programs are VMEM-sized
    for bf16; and calibrating in the dtype that will actually run is the
    representative choice), recording the input amax of every
    QUANT_TARGETS conv.  Returns {target: float amax}."""
    # this pass runs EAGERLY at model-build time (unlike the lazily-jitted
    # serving programs), so on a CPU backend the Pallas MBConv kernels
    # must run in interpret mode (Mosaic is TPU-only) — same auto-detect
    # as ops/depthwise_backward._fused_bwd
    interpret = interpret or jax.default_backend() == "cpu"
    folded = fold_mobilenetv2(variables)
    heads_folded = fold_heads(variables, cfg)

    def run(imgs):
        x = imgs.astype(compute_dtype) / jnp.asarray(
            127.5, compute_dtype
        ) - jnp.asarray(1.0, compute_dtype)
        fm1, fm2, skip = mobilenetv2_features_fused(
            folded, x, interpret=interpret
        )
        _, amaxes = heads_forward_folded(
            cfg, heads_folded, fm1, fm2, skip, collect_amax=True
        )
        return amaxes

    amaxes = jax.jit(run)(jnp.asarray(images))
    return {k: float(v) for k, v in amaxes.items()}


def make_fused_forward(cfg: ModelConfig, variables, compute_dtype=jnp.bfloat16,
                       interpret: bool = False, s2d_stem=False,
                       s2d_row_tile: int = 4, fused_heads: bool = True,
                       fold_input_rescale: bool = True,
                       quantize_pointwise: bool = False,
                       calibration_images=None):
    """Build a fused-backbone forward with the same signature/outputs as
    `SsdSegModel.apply(variables, images, train=False)`.

    fused_heads: run the task heads through the BN-folded, concat-free
    formulation (heads_forward_folded) instead of the Flax SsdSegHeads
    module.  fold_input_rescale: absorb the [0,255] -> [-1,1] rescale into
    the stem conv (fold_stem_rescale) so the program consumes the raw
    (typically uint8) input directly; disabled automatically under the s2d
    stem experiment, and bypassed at trace time for input spatial shapes
    other than cfg.input_image_shape (the border-correction bias map is
    shape-specific).

    quantize_pointwise: run the QUANT_TARGETS pointwise convs in int8
    (per-output-channel weight scales, per-tensor activation scales
    calibrated on `calibration_images` — required, a representative image
    batch in [0, 255]).  Opt-in post-training quantization; requires
    fused_heads.  See _conv_int8 for the measured rationale."""
    if cfg.backbone != "mobilenetv2":
        raise ValueError("fused inference currently supports mobilenetv2 only")
    if quantize_pointwise and not fused_heads:
        raise ValueError("quantize_pointwise requires fused_heads=True")
    if quantize_pointwise and calibration_images is None:
        raise ValueError(
            "quantize_pointwise requires calibration_images (a "
            "representative batch in [0, 255]) for the activation scales"
        )

    folded_f32 = fold_mobilenetv2(variables)

    def cast(tree):
        return jax.tree_util.tree_map(
            lambda a: jnp.asarray(a, compute_dtype), tree
        )

    folded = cast(folded_f32)
    stem_folded = None
    if fold_input_rescale and not s2d_stem:
        k0, b0 = fold_stem_rescale(
            *folded_f32["backbone-block0-expand"], cfg.input_image_shape[:2]
        )
        stem_folded = dict(folded)
        stem_folded["backbone-block0-expand"] = cast((k0, b0))

    if fused_heads:
        heads_folded_f32 = fold_heads(variables, cfg)
        heads_folded = cast(heads_folded_f32)
        quant = None
        if quantize_pointwise:
            amaxes = calibrate_pointwise_scales(
                cfg, variables, calibration_images, interpret=interpret,
                compute_dtype=compute_dtype,
            )
            quant = {
                name: (kq, ws, max(amaxes[name], 1e-6) / 127.0, b)
                for name, (kq, ws, b) in quantize_pointwise_weights(
                    heads_folded_f32
                ).items()
            }

        def apply_heads(fm1, fm2, skip):
            return heads_forward_folded(
                cfg, heads_folded, fm1, fm2, skip, quant=quant
            )
    else:
        from ssdseglib_tpu.models.builder import SsdSegHeads

        heads = SsdSegHeads(cfg=cfg)
        head_keys = [k for k in variables["params"] if k != "backbone"]
        heads_vars = cast({
            "params": {k: variables["params"][k] for k in head_keys},
            "batch_stats": {
                k: variables["batch_stats"][k]
                for k in variables["batch_stats"]
                if k != "backbone"
            },
        })

        def apply_heads(fm1, fm2, skip):
            return heads.apply(heads_vars, fm1, fm2, skip, train=False)

    expected_hw = tuple(cfg.input_image_shape[:2])

    def forward(images):
        if stem_folded is not None and images.shape[1:3] == expected_hw:
            # raw-input path: rescale folded into the stem conv
            x = images.astype(compute_dtype)
            backbone_folded = stem_folded
        else:
            x = images.astype(compute_dtype) / 127.5 - 1.0
            backbone_folded = folded
        fm1, fm2, skip = mobilenetv2_features_fused(
            backbone_folded, x, interpret=interpret, s2d_stem=s2d_stem,
            s2d_row_tile=s2d_row_tile,
        )
        return apply_heads(fm1, fm2, skip)

    return forward
