"""Space-to-depth + batch-packed fused stem/block1 kernel (Pallas TPU).

The MobileNetV2 stem and first inverted-residual block are the most
lane-starved part of the network (reference models.py:196-210: 3->32->16
->96->24 channels at 480x640 / 240x320 resolution, against 128 hardware
lanes): profiled on v5e they cost ~3.7 ms of the 12 ms batch-16 forward
while doing <7 GFLOPs.  This kernel removes the lane padding with two
weight-preserving transforms:

1. **Space-to-depth (2x)** on the input: (B, H, W, 3) -> (B, H/2, W/2, 12),
   turning the stride-2 3x3 stem conv into a stride-1 2x2 conv over 12
   channels (the 3x3 kernel re-indexed by pixel parity; entries that would
   read outside the 3x3 window are zero).
2. **Batch-lane packing (4x)**: 4 images' channels ride one 128-lane
   vector.  1x1 convs become block-diagonal matmuls (4x redundant FLOPs on
   zeros, but at full MXU utilization that is still >10x faster than
   K=16 matmuls); depthwise convs use the SAME per-channel weights for
   every image, so the packed depthwise is the plain 9-tap VPU stencil on
   full 128/384-lane vectors -- 4x fewer vector ops, no permutes.

One Pallas program computes a row-tile of the block1 output end-to-end --
stem expand -> relu6 -> dw3x3 -> relu6 -> project -> block1 expand ->
relu6 -> dw3x3 stride 2 -> relu6 -> project -- with every intermediate in
VMEM; HBM sees only the s2d input read and the (H/4, W/4, 24) output
write.

Channel plans fused here (reference models.py:196-202 stem,
:205 first sequence entry): stem expand 32, project 16; block1 expansion
factor 6 (96), out 24, stride 2.  BN is folded beforehand
(ops/fused_mbconv.fold_conv_bn).  Numerical parity with the XLA folded
path is tested in tests/test_s2d_stem.py.
"""

from __future__ import annotations

import functools
from typing import Dict, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

PACK = 4  # images packed per 128-lane group


# ---------------------------------------------------------------------------
# weight packing (host-side, NumPy)
# ---------------------------------------------------------------------------

def pack_stem_expand(kernel: np.ndarray, bias: np.ndarray):
    """(3,3,3,C) stride-2 SAME conv -> s2d 2x2 conv, batch-packed.

    XLA SAME padding for stride 2 / kernel 3 on an even dimension is
    asymmetric (0 before, 1 after), so output pixel (i,j) reads input
    rows 2i+du, du in {0,1,2}.  In s2d space that is s2d pixel (i+a)
    parity py with du = 2a+py; only (a,py) in {(0,0),(0,1),(1,0)} are
    inside the 3x3 window.  Returns (W, b): W is (4*4*Cin_s2d, PACK*C)
    with rows ordered tap-major (a,b) then batch-group then s2d channel
    (py,px,cin), matching the kernel's im2col layout; b is (PACK*C,).
    """
    kernel = np.asarray(kernel)
    kh, kw, cin, cout = kernel.shape
    assert (kh, kw) == (3, 3)
    cs2d = 4 * cin
    w2 = np.zeros((2, 2, cs2d, cout), kernel.dtype)
    for a in range(2):
        for b in range(2):
            for py in range(2):
                for px in range(2):
                    du, dv = 2 * a + py, 2 * b + px
                    if du > 2 or dv > 2:
                        continue
                    sc = py * (2 * cin) + px * cin  # (2,2,cin) flat order
                    w2[a, b, sc : sc + cin, :] = kernel[du, dv]
    packed = np.zeros((4 * PACK * cs2d, PACK * cout), kernel.dtype)
    for t in range(4):  # tap index a*2+b
        a, b = divmod(t, 2)
        for g in range(PACK):
            r0 = t * PACK * cs2d + g * cs2d
            packed[r0 : r0 + cs2d, g * cout : (g + 1) * cout] = w2[a, b]
    return packed, np.tile(np.asarray(bias), PACK)


def pack_depthwise(kernel: np.ndarray, bias: np.ndarray):
    """(3,3,1,C) depthwise kernel -> (9, PACK*C) taps tiled across groups."""
    k = np.asarray(kernel).reshape(3, 3, -1).reshape(9, -1)
    return np.tile(k, (1, PACK)), np.tile(np.asarray(bias), PACK)


def pack_pointwise(kernel: np.ndarray, bias: np.ndarray):
    """(1,1,Cin,Cout) conv -> block-diagonal (PACK*Cin, PACK*Cout)."""
    k = np.asarray(kernel).reshape(np.asarray(kernel).shape[-2], -1)
    cin, cout = k.shape
    packed = np.zeros((PACK * cin, PACK * cout), k.dtype)
    for g in range(PACK):
        packed[g * cin : (g + 1) * cin, g * cout : (g + 1) * cout] = k
    return packed, np.tile(np.asarray(bias), PACK)


# ---------------------------------------------------------------------------
# kernel
# ---------------------------------------------------------------------------

def _relu6(x):
    return jnp.minimum(jnp.maximum(x, 0.0), 6.0)


def _dw9(ep, wd_ref, bias_ref, rows: int, width: int, acc_dtype):
    """9-tap stride-1 depthwise on a (rows+2, width+2, C)-padded buffer."""
    C = ep.shape[-1]
    d = jnp.zeros((rows, width, C), acc_dtype)
    for dy in range(3):
        for dx in range(3):
            tap = wd_ref[dy * 3 + dx, :].astype(acc_dtype)
            d = d + ep[dy : dy + rows, dx : dx + width, :].astype(acc_dtype) * tap
    return d + bias_ref[...].astype(acc_dtype)


def _dw9_s2(ep, wd_ref, bias_ref, rows_out: int, width_out: int, acc_dtype):
    """9-tap stride-2 depthwise (XLA SAME for stride 2: pad after only).

    `ep` holds 2*rows_out+2 rows x 2*width_out+2 cols.  Output (r, c)
    reads rows 2r+dy, cols 2c+dx for dy,dx in {0,1,2}.  Strided selection
    uses the pair-reshape trick (slice 2N rows, reshape (N, 2), take
    index 0), which Mosaic lowers without gathers.
    """
    C = ep.shape[-1]
    d = jnp.zeros((rows_out, width_out, C), acc_dtype)
    for dy in range(3):
        rows = ep[dy : dy + 2 * rows_out]  # (2R, W+2, C)
        rows = rows.reshape(rows_out, 2, ep.shape[1], C)[:, 0]
        for dx in range(3):
            tap = wd_ref[dy * 3 + dx, :].astype(acc_dtype)
            cols = rows[:, dx : dx + 2 * width_out, :]
            cols = cols.reshape(rows_out, width_out, 2, C)[:, :, 0]
            d = d + cols.astype(acc_dtype) * tap
    return d + bias_ref[...].astype(acc_dtype)


def _row_mask(x, first_global: int, valid: int, offset):
    """Zero rows whose global index (offset + first_global + local) is
    outside [0, valid) -- conv SAME halo semantics for intermediate
    activations (zero ACTIVATIONS, not relu6(bias))."""
    rows = x.shape[0]
    idx = jax.lax.broadcasted_iota(jnp.int32, (rows, 1, 1), 0) + (
        offset + first_global
    )
    keep = jnp.logical_and(idx >= 0, idx < valid)
    return jnp.where(keep, x, jnp.zeros_like(x))


def _stem_block1_kernel(
    body_ref, tail_ref,
    w1_ref, b1_ref, wd1_ref, bd1_ref, wp1_ref, bp1_ref,
    w2_ref, b2_ref, wd2_ref, bd2_ref, wp2_ref, bp2_ref,
    out_ref,
    *, to: int, h2: int, w2dim: int, acc_dtype,
):
    """One (batch-group, row-tile) program.

    body/tail together hold padded rows [2*TO*t, 2*TO*t + 2*TO + 5) of
    the top-1/bottom-padded input (padded row p = s2d row p - 1), i.e.
    s2d global rows [R0-1, R0+2*TO+4) where R0 = 2*TO*t.
    """
    t = pl.program_id(1)
    r0 = 2 * to * t  # first block1-input (h2-res) row this tile OWNS

    need = 2 * to + 5
    x = jnp.concatenate([body_ref[...], tail_ref[...]], axis=0)[:need]
    # local row l <-> s2d global row r0 - 1 + l; rows beyond the true
    # image are zeros by construction (host-side pad), matching the SAME
    # zero-padding of the original full-res input
    x = jnp.pad(x, ((0, 0), (0, 1), (0, 0)))  # col +1 halo (true zeros)

    # ---- stem expand: s2d 2x2 conv as one im2col matmul ----------------
    # XLA SAME for stride 2/kernel 3 pads (0 before, 1 after): output
    # (h2-res) row g reads s2d rows g, g+1 and out col j reads s2d cols
    # j, j+1.  Compute out rows [r0-1, r0+2*TO+3): row k <-> global
    # g = r0-1+k reads s2d locals k, k+1.
    rexp = 2 * to + 4
    wim = w2dim
    cs = x.shape[-1]
    # one matmul per 2x2 tap, summed (a lane-dim concat into a single
    # K=4*cs matmul is "not implemented" in Mosaic at 48-lane offsets)
    e = None
    for a in range(2):
        for b in range(2):
            tap = x[a : a + rexp, b : b + wim, :].reshape(rexp * wim, cs)
            block = w1_ref[(a * 2 + b) * cs : (a * 2 + b + 1) * cs, :]
            part = jnp.dot(tap, block, preferred_element_type=acc_dtype)
            e = part if e is None else e + part
    e = _relu6(e + b1_ref[...].astype(acc_dtype))
    e = e.astype(body_ref.dtype).reshape(rexp, wim, -1)
    # halo rows outside the h2 grid must be ZERO activations for the next
    # conv's SAME padding
    e = _row_mask(e, r0 - 1, h2, 0)

    # ---- stem depthwise 3x3 s1 + project -------------------------------
    # output rows [r0, r0+2*TO+2): out row g = r0+m reads e rows
    # g-1..g+1 = local m..m+2
    ep = jnp.pad(e, ((0, 0), (1, 1), (0, 0)))
    rdw = 2 * to + 2
    d = _relu6(_dw9(ep, wd1_ref, bd1_ref, rdw, wim, acc_dtype))
    d = d.astype(body_ref.dtype)
    p = jnp.dot(
        d.reshape(rdw * wim, d.shape[-1]), wp1_ref[...],
        preferred_element_type=acc_dtype,
    )
    p = (p + bp1_ref[...].astype(acc_dtype)).astype(body_ref.dtype)
    p = p.reshape(rdw, wim, -1)
    p = _row_mask(p, r0, h2, 0)

    # ---- block1 expand + depthwise 3x3 s2 + project ---------------------
    e2 = jnp.dot(
        p.reshape(rdw * wim, p.shape[-1]), w2_ref[...],
        preferred_element_type=acc_dtype,
    )
    e2 = _relu6(e2 + b2_ref[...].astype(acc_dtype))
    e2 = e2.astype(body_ref.dtype).reshape(rdw, wim, -1)
    e2 = _row_mask(e2, r0, h2, 0)
    # rows local m <-> global r0+m ; output row o (global TO*t + o)
    # reads globals 2(TOt+o)..+2 = locals 2o..2o+2 ; cols: stride-2 SAME
    # pads right only (out col c reads cols 2c..2c+2; +2 for the pair
    # reshape's discarded lane)
    e2p = jnp.pad(e2, ((0, 0), (0, 2), (0, 0)))
    d2 = _relu6(
        _dw9_s2(e2p, wd2_ref, bd2_ref, to, wim // 2, acc_dtype)
    ).astype(body_ref.dtype)
    o = jnp.dot(
        d2.reshape(to * (wim // 2), d2.shape[-1]), wp2_ref[...],
        preferred_element_type=acc_dtype,
    )
    o = (o + bp2_ref[...].astype(acc_dtype)).astype(body_ref.dtype)
    out_ref[...] = o.reshape(to, wim // 2, -1)


def fused_s2d_stem_block1(
    images: jnp.ndarray,
    folded: Dict[str, Tuple[np.ndarray, np.ndarray]],
    row_tile: int = 4,
    interpret: bool = False,
) -> jnp.ndarray:
    """images (B, H, W, 3), already rescaled to [-1, 1].

    Returns the block1 output (B, H/4, W/4, 24), numerically matching the
    folded XLA path stem+block1 (fused_inference.mobilenetv2_features_fused
    blocks 0-1).  Requires B % 4 == 0, H % (4*row_tile) == 0, W % 4 == 0.
    """
    B, H, W, C = images.shape
    assert C == 3 and B % PACK == 0 and W % 4 == 0
    # the tail BlockSpec index (body_rows // 8) * (t + 1) is only
    # 8-row-aligned when 2*row_tile is a multiple of 8; other tiles would
    # silently read the wrong tail rows (ADVICE r2)
    assert row_tile % 4 == 0, f"row_tile must be a multiple of 4, got {row_tile}"
    h2, w2dim = H // 2, W // 2
    to = row_tile
    assert h2 % (2 * to) == 0, (H, row_tile)
    n_tiles = h2 // (2 * to)
    G = B // PACK
    dtype = images.dtype

    # s2d + batch-pack: (B,H,W,3)->(G,4,h2,2,w2,2,3)->(G,h2,w2,4*2*2*3)
    x = images.reshape(G, PACK, h2, 2, w2dim, 2, 3)
    x = x.transpose(0, 2, 4, 1, 3, 5, 6)  # (G,h2,w2,PACK,py,px,c)
    x = x.reshape(G, h2, w2dim, PACK * 12)
    # pad rows: top 1 (padded row p = s2d row p-1), bottom so the last
    # tile's tail block (8-row units) stays in range
    pad_bottom = (2 * to * n_tiles + 8) - (h2 + 1)
    x = jnp.pad(x, ((0, 0), (1, pad_bottom), (0, 0), (0, 0)))

    def pk(name, fn):
        k, b = folded[name]
        w, bias = fn(np.asarray(k, np.float32), np.asarray(b, np.float32))
        return jnp.asarray(w, dtype), jnp.asarray(bias, dtype)

    w1, b1 = pk("backbone-block0-expand", pack_stem_expand)
    wd1, bd1 = pk("backbone-block0-depthwise", pack_depthwise)
    wp1, bp1 = pk("backbone-block0-project", pack_pointwise)
    w2, b2 = pk("backbone-block1-expand", pack_pointwise)
    wd2, bd2 = pk("backbone-block1-depthwise", pack_depthwise)
    wp2, bp2 = pk("backbone-block1-project", pack_pointwise)

    kernel = functools.partial(
        _stem_block1_kernel, to=to, h2=h2, w2dim=w2dim, acc_dtype=jnp.float32
    )
    cs = PACK * 12
    body_rows = 2 * to

    def wspec(arr):
        return pl.BlockSpec(
            arr.shape, lambda g, t: (0,) * arr.ndim, memory_space=pltpu.VMEM
        )

    out_packed = pl.pallas_call(
        kernel,
        grid=(G, n_tiles),
        in_specs=[
            pl.BlockSpec(
                (None, body_rows, w2dim, cs), lambda g, t: (g, t, 0, 0),
                memory_space=pltpu.VMEM,
            ),
            # tail: next 8-row block after the body (body starts at padded
            # row 2*TO*t, needs 2*TO+5 rows; 2*TO*(t+1) is 8-aligned for
            # TO % 4 == 0)
            pl.BlockSpec(
                (None, 8, w2dim, cs),
                lambda g, t: (g, (body_rows // 8) * (t + 1), 0, 0),
                memory_space=pltpu.VMEM,
            ),
            wspec(w1), wspec(b1), wspec(wd1), wspec(bd1),
            wspec(wp1), wspec(bp1), wspec(w2), wspec(b2),
            wspec(wd2), wspec(bd2), wspec(wp2), wspec(bp2),
        ],
        out_specs=pl.BlockSpec(
            (None, to, w2dim // 2, PACK * 24), lambda g, t: (g, t, 0, 0),
            memory_space=pltpu.VMEM,
        ),
        out_shape=jax.ShapeDtypeStruct(
            (G, h2 // 2, w2dim // 2, PACK * 24), dtype
        ),
        interpret=interpret,
    )(x, x, w1, b1, wd1, bd1, wp1, bp1, w2, b2, wd2, bd2, wp2, bp2)

    # unpack lanes -> batch
    out = out_packed.reshape(G, h2 // 2, w2dim // 2, PACK, 24)
    return out.transpose(0, 3, 1, 2, 4).reshape(B, h2 // 2, w2dim // 2, 24)


def s2d_stem_block1_xla(
    images: jnp.ndarray,
    folded: Dict[str, Tuple[np.ndarray, np.ndarray]],
) -> jnp.ndarray:
    """Same s2d + batch-pack reformulation, expressed as plain XLA convs.

    The win is identical — depthwise convs run on full 128/384-lane
    vectors instead of 32/96, pointwise convs become block-diagonal
    matmuls at full MXU utilization — but XLA keeps scheduling/fusion
    freedom and there is no custom-kernel lowering risk.  Intermediates
    round-trip HBM, which is cheap next to the lane-padding they avoid.

    images (B, H, W, 3) scaled to [-1, 1]; returns (B, H/4, W/4, 24).
    """
    B, H, W, C = images.shape
    assert C == 3 and B % PACK == 0 and H % 4 == 0 and W % 4 == 0
    h2, w2dim = H // 2, W // 2
    G = B // PACK
    dtype = images.dtype

    x = images.reshape(G, PACK, h2, 2, w2dim, 2, 3)
    x = x.transpose(0, 2, 4, 1, 3, 5, 6).reshape(G, h2, w2dim, PACK * 12)

    def pk(name, fn):
        k, b = folded[name]
        w, bias = fn(np.asarray(k, np.float32), np.asarray(b, np.float32))
        return jnp.asarray(w, dtype), jnp.asarray(bias, dtype)

    w1, b1 = pk("backbone-block0-expand", pack_stem_expand)
    wd1, bd1 = pk("backbone-block0-depthwise", pack_depthwise)
    wp1, bp1 = pk("backbone-block0-project", pack_pointwise)
    w2, b2 = pk("backbone-block1-expand", pack_pointwise)
    wd2, bd2 = pk("backbone-block1-depthwise", pack_depthwise)
    wp2, bp2 = pk("backbone-block1-project", pack_pointwise)

    cs = PACK * 12
    # stem expand: s2d 2x2 conv, pad after only (matches SAME of the
    # original stride-2 conv); weight rows tap-major -> (2,2,cs,128)
    k1 = w1.reshape(2, 2, cs, w1.shape[-1])
    e = jax.lax.conv_general_dilated(
        x, k1, (1, 1), ((0, 1), (0, 1)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    ) + b1
    e = jnp.clip(e, 0.0, 6.0)

    # stem depthwise at 128 lanes
    kd1 = wd1.reshape(3, 3, 1, -1)
    d = jax.lax.conv_general_dilated(
        e, kd1, (1, 1), "SAME",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        feature_group_count=e.shape[-1],
    ) + bd1
    d = jnp.clip(d, 0.0, 6.0)

    p = jax.lax.conv_general_dilated(
        d, wp1.reshape(1, 1, *wp1.shape), (1, 1), "SAME",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    ) + bp1

    e2 = jax.lax.conv_general_dilated(
        p, w2.reshape(1, 1, *w2.shape), (1, 1), "SAME",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    ) + b2
    e2 = jnp.clip(e2, 0.0, 6.0)

    kd2 = wd2.reshape(3, 3, 1, -1)
    d2 = jax.lax.conv_general_dilated(
        e2, kd2, (2, 2), "SAME",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        feature_group_count=e2.shape[-1],
    ) + bd2
    d2 = jnp.clip(d2, 0.0, 6.0)

    o = jax.lax.conv_general_dilated(
        d2, wp2.reshape(1, 1, *wp2.shape), (1, 1), "SAME",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    ) + bp2

    out = o.reshape(G, h2 // 2, w2dim // 2, PACK, 24)
    return out.transpose(0, 3, 1, 2, 4).reshape(B, h2 // 2, w2dim // 2, 24)
