"""Whole-chain fused Pallas backward for DepthwiseConvBN+ReLU6 (train).

The round-3 depthwise-backward study (ops/depthwise_backward.py,
docs/PERFORMANCE.md) won 1.42x standalone on block0-dw but LOST 5% e2e:
the custom-call boundary un-fused the BatchNorm/ReLU6 *gradient chains*
that XLA folds into its own dw-backward convolutions, so the elementwise
work just materialized into separate passes around the kernel.  Its
post-mortem named the fix: put the WHOLE ConvBN(ReLU6) backward chain
inside the kernel.  This module is that kernel (VERDICT r3 item 1).

Unit wrapped by the custom VJP (matches `models.blocks.DepthwiseConvBN`
in train mode, reference models.py:71-92 depthwise+BN+ReLU6):

    u    = depthwise3x3(x, k)                      # SAME, stride 1
    mean, var = batch stats of u over (B, H, W)    # flax fast-variance
    z    = (u - mean) * rsqrt(var + eps) * gamma + beta
    y    = min(relu(z), 6)

Backward, given dy = dL/dy (train-mode BN: mean/var are functions of x):

    mask = (z > 0) & (z <= 6)          # JAX relu/min gradient convention
    dz   = dy * mask
    dbeta  = sum(dz);  dgamma = sum(dz * xhat)          # (pre-pass)
    du   = gamma/sigma * (dz - dbeta/N - xhat * dgamma/N)
    dx   = corr3x3(du, flip(k));  dk[i,j,c] = sum x * shift(du)

The two global BN reductions are an unavoidable barrier, so the backward
is (a) one cheap XLA pre-pass producing the per-channel scalars
(dbeta/dgamma — XLA fuses the elementwise recompute into the reduction),
then (b) ONE Pallas pass that reads x, u, dy exactly once and computes
mask, dz, du, dx and the 9 dk tap partials with everything resident in
VMEM — the elementwise chain never materializes to HBM, which is the
traffic XLA cannot avoid once dgrad and wgrad are separate convolutions.
xhat and the ReLU6 mask are RECOMPUTED in-kernel from the saved conv
output u (u is a residual either way), costing VPU flops instead of an
extra tensor read.

Lane layout follows the depthwise_backward kernel: W and C flattened into
one fully-packed lane dimension (the natural-NHWC Pallas layout measured
a ~4x lane-padding copy tax at C=32 — docs/PERFORMANCE.md packed-lane
probe), halo rows via `pl.Element` windows, f32 accumulation.

Parity: tests/test_chain_backward.py (interpret mode vs `jax.vjp` of the
plain flax composition).  Measured outcome: see docs/PERFORMANCE.md
round-4 "whole-chain fused backward study".
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

BN_EPSILON = 1e-3  # keras/flax default the blocks use (models/blocks.py)


def _row_tile(h: int, wc: int) -> int:
    """Largest divisor of `h` that is <= 32, a multiple of 8, and fits the
    working set in scoped VMEM (~16 MB; budget 12): 3 double-buffered
    input slabs (x, u, dy bf16) + the f32 du scratch slab + dx/dk
    accumulators + const blocks."""
    budget = 12 * 1024 * 1024
    for t in range(32, 7, -8):
        if h % t != 0:
            continue
        slabs = 3 * 2 * (t + 8) * wc * 2            # double-buffered inputs
        du = (t + 8) * wc * 4                       # f32 scratch slab
        f32s = 2 * t * wc * 4                       # live temporaries
        outs = 2 * t * wc * 2 + 2 * 9 * wc * 4 + 8 * wc * 4
        if slabs + du + f32s + outs <= budget:
            return t
    return h


def _chain_kernel(row_tile: int, width: int, channels: int, total_h: int,
                  out_dtype,
                  xp_ref, up_ref, dyp_ref, wk_ref, cb_ref,
                  dx_ref, dkp_ref, du_ref):
    """One (batch, row-tile) step of the whole-chain backward.

    xp/up/dyp_ref: (row_tile+8, (W+2)*C) halo slabs of the spatially
    padded conv input / conv output / output cotangent (only the first
    row_tile+2 rows are meaningful).
    wk_ref: (9, W*C) f32 kernel taps pre-tiled along W.
    cb_ref: (8, (W+2)*C) f32 per-channel constants tiled along W+2:
        rows = [mean, inv_sigma, gamma, beta, A=gamma*inv,
                Bc=gamma*inv*dbeta/N, D=gamma*inv*dgamma/N, lane_valid]
    dx_ref: (row_tile, W*C) output tile (gradient at the conv input x).
    dkp_ref: (9, W*C) f32 accumulator across the whole sequential grid.
    du_ref: (row_tile+8, (W+2)*C) f32 VMEM scratch holding the BN/ReLU6
        backward output du with the slab's halo geometry, zeroed outside
        the valid image region (so the tap reads below need no masks).
    """
    wc = width * channels
    first = (pl.program_id(0) == 0) & (pl.program_id(1) == 0)

    @pl.when(first)
    def _init():
        dkp_ref[...] = jnp.zeros_like(dkp_ref)

    mean = cb_ref[0, :]
    inv = cb_ref[1, :]
    gamma = cb_ref[2, :]
    beta = cb_ref[3, :]
    a_coef = cb_ref[4, :]
    b_coef = cb_ref[5, :]
    d_coef = cb_ref[6, :]
    lane_valid = cb_ref[7, :]

    # the whole elementwise gradient chain, in registers/VMEM:
    u = up_ref[0, :, :].astype(jnp.float32)
    dy = dyp_ref[0, :, :].astype(jnp.float32)
    xhat = (u - mean) * inv
    # mask parity: the forward activations see the BN output CAST to the
    # compute dtype (flax _normalize casts, then apply_relu runs on it);
    # same op association as flax: (u - mean) * (inv*gamma) + beta.
    # The threshold compare runs in f32 on the ROUNDED value (bf16->f32 is
    # exact; Mosaic's vector units have no bf16 compare).
    z = ((u - mean) * a_coef + beta).astype(out_dtype).astype(jnp.float32)
    mask = (z > 0.0) & (z <= 6.0)
    dz = jnp.where(mask, dy, 0.0)
    du = a_coef * dz - b_coef - d_coef * xhat
    # zero du outside the valid image: the constant-term -Bc is nonzero
    # even where u/dy are zero-padding, and rows beyond H are junk
    local = jax.lax.broadcasted_iota(jnp.int32, du.shape, 0)
    grow = pl.program_id(1) * row_tile - 1 + local
    rvalid = (grow >= 0) & (grow < total_h)
    du = jnp.where(rvalid, du * lane_valid, 0.0)
    du_ref[...] = du

    # conv taps, same schedule as ops/depthwise_backward._bwd_kernel:
    # j (lane offset {0, C, 2C}) outermost so one shifted pair is live
    duc = du_ref[1:1 + row_tile, channels:channels + wc]
    dx_acc = jnp.zeros((row_tile, wc), jnp.float32)
    for j in range(3):
        xj = xp_ref[0, :, j * channels:j * channels + wc]
        duj = du_ref[:, j * channels:j * channels + wc]
        for i in range(3):
            dkp_ref[i * 3 + j, :] += jnp.sum(
                xj[i:i + row_tile].astype(jnp.float32) * duc, axis=0
            )
            dx_acc = dx_acc + (
                wk_ref[i * 3 + (2 - j), :] * duj[2 - i:2 - i + row_tile]
            )
    dx_ref[...] = dx_acc.astype(dx_ref.dtype)


@functools.partial(jax.jit, static_argnames=("interpret",))
def dw_bn_relu6_backward(x, u, dy, kernel, gamma, beta, mean, var,
                         *, interpret: bool = False):
    """Fused (dx, dk, dgamma, dbeta) for the dw3x3+BN(train)+ReLU6 chain.

    Args:
        x: (B, H, W, C) conv input (compute dtype).
        u: (B, H, W, C) conv output saved by the forward.
        dy: (B, H, W, C) cotangent of the ReLU6 output.
        kernel: (3, 3, 1, C) HWIO depthwise kernel.
        gamma, beta: (C,) BN scale/offset (compute dtype).
        mean, var: (C,) f32 batch statistics the forward normalized with.
    """
    b, h, w, c = x.shape
    n = b * h * w
    wc = w * c
    row_tile = _row_tile(h, wc)

    inv = jax.lax.rsqrt(var + BN_EPSILON)                      # f32 (C,)
    g32 = gamma.astype(jnp.float32)
    b32 = beta.astype(jnp.float32)

    # pre-pass: the two BN reductions (the barrier).  XLA fuses the
    # elementwise recompute into the reduction — reads u and dy once.
    u32 = u.astype(jnp.float32)
    xhat_full = (u32 - mean) * inv
    # same association as flax _normalize: (u - mean) * (inv*gamma) + beta
    z_full = ((u32 - mean) * (inv * g32) + b32).astype(u.dtype)
    mask_full = (z_full > jnp.array(0, u.dtype)) & (
        z_full <= jnp.array(6, u.dtype)
    )
    dz_full = jnp.where(mask_full, dy.astype(jnp.float32), 0.0)
    dbeta = jnp.sum(dz_full, axis=(0, 1, 2))                   # f32 (C,)
    dgamma = jnp.sum(dz_full * xhat_full, axis=(0, 1, 2))      # f32 (C,)

    a_coef = g32 * inv
    b_coef = a_coef * (dbeta / n)
    d_coef = a_coef * (dgamma / n)

    # padded, lane-flattened slabs (see depthwise_backward for the layout)
    pad = ((0, 0), (1, 7), (1, 1), (0, 0))
    xp = jnp.pad(x, pad).reshape(b, h + 8, (w + 2) * c)
    up = jnp.pad(u, pad).reshape(b, h + 8, (w + 2) * c)
    dyp = jnp.pad(dy, pad).reshape(b, h + 8, (w + 2) * c)
    wk = jnp.tile(
        kernel.astype(jnp.float32).reshape(9, c)[:, None, :], (1, w, 1)
    ).reshape(9, wc)
    # per-channel const rows tiled along the PADDED width, + lane validity
    lane_valid = jnp.pad(jnp.ones((w, c), jnp.float32),
                         ((1, 1), (0, 0))).reshape((w + 2) * c)
    consts = jnp.stack([mean, inv, g32, b32, a_coef, b_coef, d_coef])
    cb = jnp.concatenate(
        [
            jnp.tile(consts[:, None, :], (1, w + 2, 1)).reshape(7, (w + 2) * c),
            lane_valid[None, :],
        ]
    )

    grid = (b, h // row_tile)
    dx_flat, dk_part = pl.pallas_call(
        functools.partial(
            _chain_kernel, row_tile, w, c, h, jnp.dtype(u.dtype)
        ),
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
            pl.BlockSpec(
                (pl.Element(1), pl.Element(row_tile + 8),
                 pl.Element((w + 2) * c)),
                lambda bi, hi: (bi, hi * row_tile, 0),
            ),
            pl.BlockSpec((9, wc), lambda bi, hi: (0, 0)),
            pl.BlockSpec((8, (w + 2) * c), lambda bi, hi: (0, 0)),
        ],
        out_specs=[
            pl.BlockSpec((None, row_tile, wc), lambda bi, hi: (bi, hi, 0)),
            pl.BlockSpec((9, wc), lambda bi, hi: (0, 0)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((b, h, wc), x.dtype),
            jax.ShapeDtypeStruct((9, wc), jnp.float32),
        ],
        scratch_shapes=[
            pltpu.VMEM((row_tile + 8, (w + 2) * c), jnp.float32)
        ],
        interpret=interpret,
    )(xp, up, dyp, wk, cb)

    dx = dx_flat.reshape(b, h, w, c)
    dk = dk_part.reshape(9, w, c).sum(axis=1).reshape(3, 3, 1, c)
    return dx, dk, dgamma, dbeta


def chain_applicable(h: int, w: int, c: int, kernel_size, strides,
                     dilation, relu_max) -> bool:
    """Envelope mirroring depthwise_backward.pallas_bwd_applicable plus
    the chain's own requirements (ReLU6 activation present)."""
    tile = _row_tile(h, w * c)
    return (
        tuple(kernel_size) == (3, 3)
        and tuple(strides) == (1, 1)
        and tuple(dilation) == (1, 1)
        and relu_max == 6.0
        and c <= 64
        and h * w * c >= 1_000_000
        and tile <= 32
        and tile % 8 == 0
    )


def _stats(u) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """flax `_compute_stats` semantics: f32, fast variance, clipped."""
    u32 = u.astype(jnp.float32)
    mean = jnp.mean(u32, axis=(0, 1, 2))
    var = jnp.maximum(
        jnp.mean(u32 * u32, axis=(0, 1, 2)) - mean * mean, 0.0
    )
    return mean, var


def _plain_dw(x, kernel):
    return jax.lax.conv_general_dilated(
        x, kernel, (1, 1), "SAME",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        feature_group_count=x.shape[-1],
    )


def _forward_math(x, kernel, gamma, beta):
    u = _plain_dw(x, kernel)
    mean, var = _stats(u)
    inv = jax.lax.rsqrt(var + BN_EPSILON)
    # flax _normalize association: mul = rsqrt(var+eps) * scale
    y32 = (u.astype(jnp.float32) - mean) * (
        inv * gamma.astype(jnp.float32)
    ) + beta.astype(jnp.float32)
    z = y32.astype(u.dtype)
    y = jnp.minimum(jax.nn.relu(z), jnp.array(6, z.dtype))
    return y, u, mean, var


@jax.custom_vjp
def dw_bn_relu6_chain(x, kernel, gamma, beta):
    """dw3x3(SAME, s1) -> train-mode BatchNorm -> ReLU6, as one custom-VJP
    unit whose backward is the whole-chain fused Pallas kernel.

    Returns (y, batch_mean, batch_var); the stats outputs exist for the
    caller's running-average update and must be consumed under
    `stop_gradient` (their cotangents are ignored, matching flax's
    non-differentiated variable writes).
    """
    y, _, mean, var = _forward_math(x, kernel, gamma, beta)
    return y, mean, var


def _chain_fwd(x, kernel, gamma, beta):
    y, u, mean, var = _forward_math(x, kernel, gamma, beta)
    return (y, mean, var), (x, u, kernel, gamma, beta, mean, var)


def _chain_bwd(res, cts):
    dy = cts[0]  # stats cotangents are zero by contract (stop_gradient)
    x, u, kernel, gamma, beta, mean, var = res
    interpret = jax.default_backend() == "cpu"
    dx, dk, dgamma, dbeta = dw_bn_relu6_backward(
        x, u, dy, kernel, gamma, beta, mean, var, interpret=interpret
    )
    return (
        dx,
        dk.astype(kernel.dtype),
        dgamma.astype(gamma.dtype),
        dbeta.astype(beta.dtype),
    )


dw_bn_relu6_chain.defvjp(_chain_fwd, _chain_bwd)
