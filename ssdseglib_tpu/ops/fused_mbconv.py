"""Fused inverted-residual (MBConv) inference kernel (Pallas TPU).

The MobileNetV2 backbone is bandwidth-bound at inference (docs/
PERFORMANCE.md): every block bounces an expansion-factor-6 intermediate
tensor through HBM between its three convs.  This kernel runs a whole
stride-1 inverted-residual block — expand 1x1 -> relu6 -> depthwise 3x3 ->
relu6 -> project 1x1 -> (+residual) — in one Pallas program per batch
element, keeping the expanded tensor entirely in VMEM:

    HBM traffic per pixel drops from ~(Cin + 2E + Cout) to (Cin + Cout),
    a ~6x reduction at expansion factor 6.

Batch-norm parameters are folded into conv weights + bias beforehand
(`fold_conv_bn`), so the kernel sees pure conv+bias+relu6 — numerically
identical to the Flax inference path (see tests/test_fused_mbconv.py).

Scope: stride-1 blocks with SAME padding (the 10 residual repeats of the
reference plan, models.py:205-210, plus the non-residual stride-1 firsts);
stride-2 blocks and the stem stay on the XLA path.
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ssdseglib_tpu.models.blocks import BN_EPSILON


def fold_conv_bn(kernel, gamma, beta, mean, var, eps: float = BN_EPSILON):
    """Fold BatchNorm(scale, bias, mean, var) into (kernel', bias').

    conv -> BN == conv with kernel * (gamma / sqrt(var + eps)) per output
    channel and bias (beta - mean * gamma / sqrt(var + eps)).
    """
    scale = np.asarray(gamma) / np.sqrt(np.asarray(var) + eps)
    kernel = np.asarray(kernel) * scale  # broadcast over last (out) axis
    bias = np.asarray(beta) - np.asarray(mean) * scale
    return kernel.astype(np.float32), bias.astype(np.float32)


def _mbconv_kernel(
    x_ref, w1_ref, b1_ref, wd_ref, b2_ref, w3_ref, b3_ref, out_ref,
    *, residual: bool, acc_dtype,
):
    """One batch element: expand -> dw3x3 -> project, all resident in VMEM.

    Shapes: x (1, H, W, Cin); w1 (Cin, E); wd (9, E) [3x3 taps unrolled];
    w3 (E, Cout); out (1, H, W, Cout).
    """
    H, W, Cin = x_ref.shape  # the None batch dim is squeezed by BlockSpec
    E = w1_ref.shape[1]
    Cout = w3_ref.shape[1]

    x = x_ref[...]  # (H, W, Cin)

    # expand 1x1 + relu6 (MXU)
    e = jnp.dot(
        x.reshape(H * W, Cin), w1_ref[...], preferred_element_type=acc_dtype
    )
    e = (e + b1_ref[...].astype(acc_dtype)).astype(x.dtype)
    e = jnp.minimum(jnp.maximum(e, 0.0), 6.0).reshape(H, W, E)

    # depthwise 3x3 SAME + relu6 (VPU: 9 shifted multiply-adds on the
    # zero-padded expanded tile)
    ep = jnp.pad(e, ((1, 1), (1, 1), (0, 0)))
    d = jnp.zeros((H, W, E), dtype=acc_dtype)
    for dy in range(3):
        for dx in range(3):
            tap = wd_ref[dy * 3 + dx, :].astype(acc_dtype)
            d = d + ep[dy : dy + H, dx : dx + W, :].astype(acc_dtype) * tap
    d = (d + b2_ref[...].astype(acc_dtype)).astype(x.dtype)
    d = jnp.minimum(jnp.maximum(d, 0.0), 6.0)

    # project 1x1 (MXU), optional residual
    p = jnp.dot(
        d.reshape(H * W, E), w3_ref[...], preferred_element_type=acc_dtype
    )
    p = (p + b3_ref[...].astype(acc_dtype)).astype(x.dtype).reshape(H, W, Cout)
    if residual:
        p = p + x
    out_ref[...] = p


def fused_mbconv(
    x: jnp.ndarray,
    w_expand: jnp.ndarray,
    b_expand: jnp.ndarray,
    w_depthwise: jnp.ndarray,
    b_depthwise: jnp.ndarray,
    w_project: jnp.ndarray,
    b_project: jnp.ndarray,
    residual: bool = True,
    interpret: bool = False,
) -> jnp.ndarray:
    """Fused stride-1 inverted-residual block.

    Args:
        x: (B, H, W, Cin) NHWC input
        w_expand: (1, 1, Cin, E) or (Cin, E) folded expand kernel
        b_expand: (E,) folded bias
        w_depthwise: (3, 3, 1, E) folded depthwise kernel (Flax layout)
        b_depthwise: (E,)
        w_project: (1, 1, E, Cout) or (E, Cout)
        b_project: (Cout,)
        residual: add the input (requires Cin == Cout)
    Returns:
        (B, H, W, Cout)
    """
    B, H, W, Cin = x.shape
    w1 = jnp.asarray(w_expand).reshape(Cin, -1)
    E = w1.shape[1]
    wd = jnp.asarray(w_depthwise).reshape(3, 3, E).reshape(9, E)
    w3 = jnp.asarray(w_project).reshape(E, -1)
    Cout = w3.shape[1]
    if residual and Cin != Cout:
        raise ValueError("residual requires Cin == Cout")

    # Batch chunking: compiling this kernel with grid > 16 on a
    # large-spatial block (e.g. 120x160, E=144) crashes this environment's
    # remote-compile helper (isolated empirically: 30x40 E=384 compiles at
    # B=32, 120x160 E=144 does not).  Grid programs execute serially per
    # core, so slicing the batch into <=16-element sub-calls inside the
    # same jit costs nothing and lifts the batch ceiling.
    if B > 16:
        chunk = 16
        parts = [
            fused_mbconv(
                x[i : i + chunk], w_expand, b_expand, w_depthwise,
                b_depthwise, w_project, b_project,
                residual=residual, interpret=interpret,
            )
            for i in range(0, B, chunk)
        ]
        return jnp.concatenate(parts, axis=0)

    dtype = x.dtype
    kernel = functools.partial(
        _mbconv_kernel, residual=residual, acc_dtype=jnp.float32
    )
    return pl.pallas_call(
        kernel,
        grid=(B,),
        in_specs=[
            pl.BlockSpec((None, H, W, Cin), lambda i: (i, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((Cin, E), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((E,), lambda i: (0,), memory_space=pltpu.VMEM),
            pl.BlockSpec((9, E), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((E,), lambda i: (0,), memory_space=pltpu.VMEM),
            pl.BlockSpec((E, Cout), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((Cout,), lambda i: (0,), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((None, H, W, Cout), lambda i: (i, 0, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, H, W, Cout), dtype),
        interpret=interpret,
    )(x, w1.astype(dtype), jnp.asarray(b_expand, dtype),
      wd.astype(dtype), jnp.asarray(b_depthwise, dtype),
      w3.astype(dtype), jnp.asarray(b_project, dtype))


def fold_block(params, stats, block: int):
    """Folded kernel args for backbone block `block` (expand/dw/project)."""
    def fold(stage):
        name = f"backbone-block{block}-{stage}"
        p, s = params[name], stats[name]
        return fold_conv_bn(
            p["conv"]["kernel"], p["batchnorm"]["scale"],
            p["batchnorm"]["bias"], s["batchnorm"]["mean"],
            s["batchnorm"]["var"],
        )

    we, be = fold("expand")
    wd, bd = fold("depthwise")
    wp, bp = fold("project")
    return we, be, wd, bd, wp, bp
