"""Pallas fused backward pass for 3x3 stride-1 depthwise convolutions.

Why: the round-3 train profile (docs/PERFORMANCE.md) puts ~7.7 ms of the
59 ms bf16 train step in the backward of the three big-spatial depthwise
convs (block0-dw 4.08 ms @16x240x320x32, block1-dw/block2-dw 1.8 each).
XLA lowers a depthwise backward as two more depthwise convolutions (dgrad:
conv of dy with the flipped kernel; wgrad: a conv whose *output* is the
3x3x1xC kernel) — three full passes over ~78 MB tensors whose C<=144
channel dim occupies at most 144 of the 128-lane registers, so every pass
runs lane-padded (the round-3 profile note "bandwidth-bound on lane-padded
tensors").  Two earlier XLA-level reformulations (per-tap pad+slice, dw
shift-multiply) LOST because XLA materializes the shifted operands
(docs/PERFORMANCE.md round-3 studies).

This kernel computes BOTH gradients in ONE pass over x and dy, with the
W and C dims flattened into a single fully-packed lane dimension (W*C
lanes, no padding waste), which an XLA fusion cannot express across a
conv op boundary:

    dx[t,w,c] = sum_{i,j} k[i,j,c] * dy[t+1-i, w+1-j, c]
    dk[i,j,c] = sum_{t,w}  x[t+i-1, w+j-1, c] * dy[t,w,c]

Grid: (B, H/row_tile); each step loads one (row_tile+2, (W+2)*C) halo slab
of the padded x and dy (halo expressed with `pl.Element` overlapping row
windows), emits the dx row tile, and accumulates the 9 per-tap dk partial
row-sums into a (9, W*C) f32 accumulator that lives across the whole
sequential grid (constant output index map); the final W-reduction happens
outside the kernel on the tiny (9, W*C) result.  All products accumulate
in f32, exactly like the conv unit's accumulator for bf16 operands.

The reference trains its depthwise layers through cuDNN's own fused
backward (reference notebook 03 cell 16 via Keras fit); this is the
TPU-native equivalent.  Parity: tests/test_depthwise_backward.py
(interpret mode vs `jax.vjp` of the plain conv).

MEASURED OUTCOME (v5e, round 3): standalone the kernel WINS 1.3-1.4x at
block0-dw shapes (xla 3.85 -> pallas 2.71 ms incl. its pad/relayout,
tests/tpu_scripts/dw_backward_probe.py) and LOSES 0.6-0.7x at C=144
(block2-dw: the j*C lane shifts cross 128-lane register boundaries).
END-TO-END the gated (block0-only) path LOSES 5% (59.0 -> 62.0 ms/step,
interleaved best-of-2, tests/tpu_scripts/dw_bwd_ab.py): the custom-call
boundary un-fuses the BN/ReLU6 gradient chains that XLA otherwise folds
into its own dw-backward convs, and the extra materialized operands cost
more than the kernel saves.  Fifth confirmation of the repo's conv-
reformulation lesson (docs/PERFORMANCE.md): the profile row charged to a
conv backward is partly the fused elementwise chain riding on it.  Kept
as a parity-tested opt-in (`models.blocks.set_depthwise_bwd_impl`)
negative result, same policy as the s2d-stem/dw-shift/wgrad studies.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl


def _row_tile(h: int, wc: int) -> int:
    """Largest divisor of `h` that is <= 32, a multiple of 8 (the dx
    block's sublane dim must divide by 8 — Mosaic tiling constraint), and
    fits the kernel's working set in scoped VMEM (~16 MB; budget 12):
    2 halo slabs + the live shifted pair (bf16) + dyc/dx f32 temps +
    dkp/wk f32 + double-buffered in/out blocks.  Falls back to whole-H
    blocks (always legal) when no multiple-of-8 divisor exists."""
    budget = 12 * 1024 * 1024
    for t in range(32, 7, -8):
        if h % t != 0:
            continue
        slabs = 2 * 2 * (t + 8) * wc * 2          # double-buffered inputs
        live = 2 * (t + 8) * wc * 2               # one shifted x/dy pair
        f32s = 2 * t * wc * 4                     # dyc + dx accumulator
        outs = 2 * t * wc * 2 + 2 * 9 * wc * 4    # dx blocks + dkp + wk
        if slabs + live + f32s + outs <= budget:
            return t
    return h


def _bwd_kernel(row_tile: int, width: int, channels: int,
                xp_ref, dyp_ref, wk_ref, dx_ref, dkp_ref):
    """One (batch, row-tile) step: dx tile + per-tap dk partial row-sums.

    xp_ref/dyp_ref: (row_tile+8, (W+2)*C) halo slabs of the padded inputs
    (only the first row_tile+2 rows are used -- the 8-row halo keeps the
    block sublane dim a multiple of 8).
    wk_ref: (9, W*C) f32 — kernel taps pre-tiled along W.
    dx_ref: (row_tile, W*C) output tile.
    dkp_ref: (9, W*C) f32 accumulator, same block across the whole grid.
    """
    wc = width * channels
    first = (pl.program_id(0) == 0) & (pl.program_id(1) == 0)

    @pl.when(first)
    def _init():
        dkp_ref[...] = jnp.zeros_like(dkp_ref)

    # The only cross-lane work: ONE shift per tensor per column offset
    # {0, C, 2C} (width W*C out of the (W+2)*C slab).  The j loop is
    # OUTERMOST so only one shifted x/dy pair is live at a time (hoisting
    # all six shifted values OOM'd scoped VMEM at C=144); the three row
    # offsets inside are plain sublane slices.  An offset-per-tap
    # formulation (9 lane shuffles per tensor per step) lost 0.68x at
    # C=144, where each shift crosses the 128-lane register boundary.
    # dy center tile (rows 1..1+T, col offset C in padded coords), f32 once
    dyc = dyp_ref[0, 1:1 + row_tile,
                  channels:channels + wc].astype(jnp.float32)

    dx_acc = jnp.zeros((row_tile, wc), jnp.float32)
    for j in range(3):
        xj = xp_ref[0, :, j * channels:j * channels + wc]
        dyj = dyp_ref[0, :, j * channels:j * channels + wc]
        for i in range(3):
            # dk[i,j] partial: x slab rows [i, i+T), lanes [j*C, j*C+W*C)
            dkp_ref[i * 3 + j, :] += jnp.sum(
                xj[i:i + row_tile].astype(jnp.float32) * dyc, axis=0
            )
            # dx tap (i, 2-j): k[i,2-j,c] * dy[t+1-i, w+1-(2-j), c] ->
            # padded dy slab rows [2-i, 2-i+T), lanes [j*C, j*C+W*C)
            dx_acc = dx_acc + (
                wk_ref[i * 3 + (2 - j), :]
                * dyj[2 - i:2 - i + row_tile].astype(jnp.float32)
            )
    dx_ref[...] = dx_acc.astype(dx_ref.dtype)


@functools.partial(jax.jit, static_argnames=("interpret",))
def depthwise3x3_backward(x, dy, kernel, *, interpret: bool = False):
    """Fused (dx, dk) for a SAME stride-1 3x3 depthwise conv.

    Args:
        x: (B, H, W, C) input of the forward conv.
        dy: (B, H, W, C) cotangent of the forward output.
        kernel: (3, 3, 1, C) HWIO depthwise kernel (flax layout).
    Returns:
        dx with x's shape/dtype, dk with kernel's shape, f32.
    """
    b, h, w, c = x.shape
    assert dy.shape == x.shape, (x.shape, dy.shape)
    assert kernel.shape == (3, 3, 1, c), kernel.shape
    row_tile = _row_tile(h, w * c)
    wc = w * c

    # Padded, lane-flattened operands: (B, H+8, (W+2)*C).  The pad+reshape
    # is one fused XLA copy; it is what buys the fully-packed lane dim.
    # Rows are padded (1, 7) so the halo slab can be row_tile+8 rows --
    # Mosaic requires block sublane dims divisible by 8; the kernel only
    # touches the first row_tile+2 slab rows.
    pad = ((0, 0), (1, 7), (1, 1), (0, 0))
    xp = jnp.pad(x, pad).reshape(b, h + 8, (w + 2) * c)
    dyp = jnp.pad(dy, pad).reshape(b, h + 8, (w + 2) * c)
    # Kernel taps tiled along W so the dx tap product is one lane-aligned
    # multiply: (9, W*C) f32, constant block resident in VMEM.
    wk = jnp.tile(
        kernel.astype(jnp.float32).reshape(9, c)[:, None, :], (1, w, 1)
    ).reshape(9, wc)

    grid = (b, h // row_tile)
    dx_flat, dk_part = pl.pallas_call(
        functools.partial(_bwd_kernel, row_tile, w, c),
        grid=grid,
        in_specs=[
            pl.BlockSpec(
                (pl.Element(1), pl.Element(row_tile + 8),
                 pl.Element((w + 2) * c)),
                lambda bi, hi: (bi, hi * row_tile, 0),
            ),
            pl.BlockSpec(
                (pl.Element(1), pl.Element(row_tile + 8),
                 pl.Element((w + 2) * c)),
                lambda bi, hi: (bi, hi * row_tile, 0),
            ),
            pl.BlockSpec((9, wc), lambda bi, hi: (0, 0)),
        ],
        out_specs=[
            pl.BlockSpec((None, row_tile, wc), lambda bi, hi: (bi, hi, 0)),
            pl.BlockSpec((9, wc), lambda bi, hi: (0, 0)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((b, h, wc), x.dtype),
            jax.ShapeDtypeStruct((9, wc), jnp.float32),
        ],
        interpret=interpret,
    )(xp, dyp, wk)

    dx = dx_flat.reshape(b, h, w, c)
    dk = dk_part.reshape(9, w, c).sum(axis=1).reshape(3, 3, 1, c)
    return dx, dk


def pallas_bwd_applicable(h: int, w: int, c: int, kernel_size, strides,
                          dilation) -> bool:
    """Measured envelope where the fused Pallas backward beats XLA's vjp
    (v5e, tests/tpu_scripts/dw_backward_probe.py): stride-1 SAME 3x3,
    small channel count (C=32 won 1.3-1.4x; C=144 LOST 0.6-0.7x — its
    j*C lane shifts cross 128-lane register boundaries), big enough
    spatial extent to matter, and a legal <=32 multiple-of-8 row tile
    (_row_tile's whole-H fallback can return a non-multiple-of-8 height,
    which violates Mosaic's sublane tiling constraint — reject it)."""
    tile = _row_tile(h, w * c)
    return (
        tuple(kernel_size) == (3, 3)
        and tuple(strides) == (1, 1)
        and tuple(dilation) == (1, 1)
        and c <= 64
        and h * w * c >= 1_000_000
        and tile <= 32
        and tile % 8 == 0
    )


@jax.custom_vjp
def depthwise_conv3x3_fused_bwd(x, kernel):
    """SAME stride-1 3x3 depthwise conv whose backward is the fused Pallas
    kernel above.  Forward is bit-identical to the plain XLA conv (it IS
    the plain conv); only the gradient lowering differs (same f32
    accumulation, different summation order)."""
    return _plain_dw(x, kernel)


def _plain_dw(x, kernel):
    return jax.lax.conv_general_dilated(
        x, kernel, (1, 1), "SAME",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        feature_group_count=x.shape[-1],
    )


def _fused_fwd(x, kernel):
    return _plain_dw(x, kernel), (x, kernel)


def _fused_bwd(res, dy):
    import jax as _jax

    x, kernel = res
    # interpret mode on CPU (the test suite forces CPU; Mosaic is TPU-only)
    interpret = _jax.default_backend() == "cpu"
    dx, dk = depthwise3x3_backward(x, dy, kernel, interpret=interpret)
    return dx, dk.astype(kernel.dtype)


depthwise_conv3x3_fused_bwd.defvjp(_fused_fwd, _fused_bwd)
