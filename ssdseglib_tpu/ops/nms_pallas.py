"""Pallas TPU kernel for the greedy NMS selection scan.

The combined-NMS pipeline (ops/nms.py) is vectorized XLA except for one
inherently sequential piece: the greedy scan over score-sorted candidates
(a selected box suppresses lower-scored overlapping boxes, selection stops
at `max_keep`).  As a `lax.fori_loop` that's K (=256) dependent iterations
of tiny vector work — latency-bound, with the loop state bouncing through
HBM.  This kernel runs the entire scan per (batch, class) slice inside one
Pallas program with the IoU tile resident in VMEM:

    grid = (B * C,)    block = (K, K) IoU + (1, K) validity   -> (1, K) keep

K is padded to the 128-lane boundary by the caller.  Used on TPU; tests run
it in interpreter mode for CPU parity with the XLA scan.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _nms_scan_kernel(
    iou_ref, valid_ref, keep_ref, *, iou_threshold: float, max_keep: int
):
    """One batch slice, all classes vectorized: greedy scan over K sorted
    candidates per class.

    Refs: iou (C, K, K), valid (C, K), keep (C, K).  The scan state lives in
    on-chip VMEM scratch — per-class suppression and selection-count
    vectors — because loop-carried values cannot be dynamically indexed in
    Mosaic, and dynamic-lane scalar loads/stores must be replaced with
    masked reductions / one-hot ORs (one VPU op over (C, K) per step).
    """
    C, K = valid_ref.shape
    col = jax.lax.broadcasted_iota(jnp.int32, (C, K), 1)

    def inner(sup_ref, cnt_ref):
        sup_ref[:] = jnp.zeros((C, K), dtype=jnp.int32)
        keep_ref[:] = jnp.zeros((C, K), dtype=jnp.int32)
        cnt_ref[:] = jnp.zeros((C, 1), dtype=jnp.int32)

        def body(i, _):
            lane = (col == i).astype(jnp.int32)  # (C, K) one-hot column i
            valid_i = jnp.sum(valid_ref[:] * lane, axis=1, keepdims=True)
            sup_i = jnp.sum(sup_ref[:] * lane, axis=1, keepdims=True)
            take = (
                (valid_i > 0) & (sup_i == 0) & (cnt_ref[:] < max_keep)
            )  # (C, 1)
            keep_ref[:] = keep_ref[:] | (lane * take.astype(jnp.int32))

            iou_row = iou_ref[:, i, :]  # (C, K)
            newly = (take & (iou_row > iou_threshold) & (col > i)).astype(
                jnp.int32
            )
            sup_ref[:] = sup_ref[:] | newly
            cnt_ref[:] = cnt_ref[:] + take.astype(jnp.int32)
            return 0

        jax.lax.fori_loop(0, K, body, 0)

    pl.run_scoped(
        inner,
        pltpu.VMEM((C, K), jnp.int32),
        pltpu.VMEM((C, 1), jnp.int32),
    )


def greedy_select_pallas(
    iou: jnp.ndarray,
    candidate_valid: jnp.ndarray,
    iou_threshold: float,
    max_keep: int,
    interpret: bool = False,
) -> jnp.ndarray:
    """Pallas counterpart of ops.nms._greedy_select.

    Args:
        iou: (..., K, K) pairwise IoU of score-sorted candidates
        candidate_valid: (..., K) bool
    Returns:
        (..., K) bool keep mask (same semantics as the XLA scan).
    """
    batch_shape = candidate_valid.shape[:-1]
    K = candidate_valid.shape[-1]
    # pad K to the 128-lane boundary
    K_pad = ((K + 127) // 128) * 128
    if len(batch_shape) >= 2:
        # grid over the leading axis, inner axes vectorized in the kernel
        B = batch_shape[0]
        C = 1
        for d in batch_shape[1:]:
            C *= d
    else:
        B = batch_shape[0] if batch_shape else 1
        C = 1

    iou_flat = iou.reshape(B, C, K, K).astype(jnp.float32)
    valid_flat = candidate_valid.reshape(B, C, K).astype(jnp.int32)
    if K_pad != K:
        iou_flat = jnp.pad(
            iou_flat, ((0, 0), (0, 0), (0, K_pad - K), (0, K_pad - K))
        )
        valid_flat = jnp.pad(valid_flat, ((0, 0), (0, 0), (0, K_pad - K)))

    kernel = functools.partial(
        _nms_scan_kernel, iou_threshold=float(iou_threshold),
        max_keep=int(max_keep),
    )
    keep = pl.pallas_call(
        kernel,
        grid=(B,),
        in_specs=[
            pl.BlockSpec((None, C, K_pad, K_pad), lambda i: (i, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((None, C, K_pad), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((None, C, K_pad), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, C, K_pad), jnp.int32),
        interpret=interpret,
    )(iou_flat, valid_flat)

    return (keep[:, :, :K] > 0).reshape(*batch_shape, K)
