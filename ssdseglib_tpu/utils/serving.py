"""Shared NumPy-out serving conventions.

One home for the two pieces of host-side serving logic that both the live
`InferenceModel` (models/builder.py) and the deployed `ServingBundle`
(export.py) expose, so the paths cannot drift:

- `format_outputs`: the mask-dtype coercion + optional background-box
  filter (reference layers.py:165-166) applied to every NumPy-out predict.
- `predict_batched_chunks`: the any-N chunk / repeat-pad / slice loop that
  serves an arbitrary number of images through ONE compiled batch size.
"""

from __future__ import annotations

from typing import Callable, List, Sequence, Tuple

import numpy as np


def format_outputs(
    mask, det, suppress_background: bool
) -> Tuple[np.ndarray, np.ndarray]:
    """NumPy-out conventions shared by every predict surface: bf16 masks
    come back as float32 (the on-device/transfer savings are already
    realized; numpy has no bfloat16), 'class_map' uint8 passes through,
    and the optional host-side background-box filter (reference
    layers.py:165-166) drops label-0 rows."""
    mask, det = np.asarray(mask), np.asarray(det)
    if mask.dtype != np.uint8 and mask.dtype != np.float32:
        mask = mask.astype(np.float32)
    if suppress_background:
        det = det[det[..., 0] > 0.0]
    return mask, det


def predict_batched_chunks(
    images,
    batch: int,
    run_chunk: Callable[[np.ndarray], Tuple[np.ndarray, np.ndarray]],
) -> Tuple[np.ndarray, np.ndarray]:
    """Serve an arbitrary number of images through one compiled program.

    XLA programs are static-shape, so every distinct batch size otherwise
    traces + compiles a fresh executable (20-40 s through a
    remote-attached TPU).  This chunks the input into `batch`-size pieces
    and pads the ragged tail BY REPEATING ITS LAST IMAGE, then slices
    outputs back to the real rows.  Repeat-padding (not zero-padding) is
    what keeps the real rows bit-exact under the reference's batch-global
    segmentation suppression (reference layers.py:207): a duplicate image
    adds no new classes to the batch presence set, while a zero/blank pad
    image could.  As with Keras `predict` over a batched dataset
    (reference nb 03 cell 25), the batch-global quirk applies per served
    chunk.

    `run_chunk(chunk)` executes one full `(batch, H, W, C)` chunk and
    returns `(mask, det)` (device or host arrays).  Output-convention
    formatting (`format_outputs`) is the caller's job — padded rows must
    be sliced by position BEFORE any background filter drops real rows.
    """
    images = np.asarray(images)
    if images.ndim != 4:
        raise ValueError(
            f"predict_batched expects (N, H, W, C) images, got "
            f"shape {images.shape}"
        )
    if not isinstance(batch, int) or isinstance(batch, bool) or batch < 1:
        raise ValueError(f"batch must be a positive int, got {batch!r}")
    if images.shape[0] == 0:
        raise ValueError("predict_batched got an empty image stack")

    return predict_batched_chunks_multi(images, (batch,), run_chunk)


def plan_batched_chunks(n: int, sizes: Sequence[int]) -> List[Tuple[int, int]]:
    """Chunk plan for serving `n` images through programs baked at
    `sizes`: a list of (real_rows, program_batch) pairs, greedily using
    the largest program that fits the remaining rows, then padding the
    ragged tail up to the smallest program.  A b1+b16 bundle thus serves
    one image at b1 compute (not 16x repeat-padded), and e.g. 35 images
    as 16+16+1+1+1 with zero padded rows."""
    if n < 1:
        raise ValueError("plan_batched_chunks needs n >= 1")
    sizes = sorted(set(int(s) for s in sizes))
    if not sizes or sizes[0] < 1:
        raise ValueError(f"program batch sizes must be positive, got {sizes}")
    plan: List[Tuple[int, int]] = []
    remaining = n
    while remaining > 0:
        fits = [s for s in sizes if s <= remaining]
        if fits:
            plan.append((fits[-1], fits[-1]))
        else:
            # remaining < smallest program: pad up to it
            plan.append((remaining, sizes[0]))
        remaining -= plan[-1][0]
    return plan


def predict_batched_chunks_multi(
    images,
    batches: Sequence[int],
    run_chunk: Callable[[np.ndarray], Tuple[np.ndarray, np.ndarray]],
) -> Tuple[np.ndarray, np.ndarray]:
    """`predict_batched_chunks` over SEVERAL baked program sizes: each
    chunk handed to `run_chunk` has a shape[0] from `batches`, chosen by
    `plan_batched_chunks` (largest-fit, minimal tail padding)."""
    images = np.asarray(images)
    if images.ndim != 4:
        raise ValueError(
            f"predict_batched expects (N, H, W, C) images, got "
            f"shape {images.shape}"
        )
    for b in batches:
        if not isinstance(b, (int, np.integer)) or isinstance(b, bool) or b < 1:
            raise ValueError(f"batch must be a positive int, got {b!r}")
    if images.shape[0] == 0:
        raise ValueError("predict_batched got an empty image stack")

    masks, dets = [], []
    start = 0
    for k, b in plan_batched_chunks(images.shape[0], batches):
        chunk = images[start : start + k]
        start += k
        if k < b:
            pad = np.repeat(chunk[-1:], b - k, axis=0)
            chunk = np.concatenate([chunk, pad], axis=0)
        mask, det = run_chunk(chunk)
        # slice BEFORE any host-side filter: padded rows are dropped by
        # position, real rows (later) by the background filter
        masks.append(np.asarray(mask)[:k])
        dets.append(np.asarray(det)[:k])
    return np.concatenate(masks, 0), np.concatenate(dets, 0)
