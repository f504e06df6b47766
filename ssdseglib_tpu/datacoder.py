"""Data reading + ground-truth encoding — mirror of reference datacoder.py.

Split TPU-first into two halves:

- **host half**: PNG/CSV decoding into fixed-shape padded NumPy arrays
  (images uint8, masks uint8 class maps, ground truth padded to
  ``max_ground_truth_boxes`` with a validity mask).  The reference does all
  of this per-sample inside a tf.data graph (reference datacoder.py:302-347)
  — the ragged anchor-matching there is the input-bound hot loop
  (SURVEY.md §3.1).
- **device half**: one jitted batched function that flips, color-augments,
  one-hot-encodes the mask and runs the vectorized anchor matcher
  (ops/encoding.py) for the whole batch at once.

`DataEncoderDecoder` keeps the reference constructor/method surface
(num_classes, image_shape, per-coordinate anchor arrays, iou_threshold,
standard deviations, `read_and_encode`, `decode_to_centroids`,
`decode_to_corners`).
"""

from __future__ import annotations

import csv as _csv
import functools
import io
import os
from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ssdseglib_tpu.boxes import Anchors, coordinates_centroids_to_corners
from ssdseglib_tpu.config import EncodingConfig
from ssdseglib_tpu.ops import color as color_ops
from ssdseglib_tpu.ops import encoding as enc_ops
from ssdseglib_tpu.utils import sample_cache as _sample_cache


def read_image(path_file_image: str) -> np.ndarray:
    """Read an RGB PNG to float32 (H, W, 3) (reference datacoder.py:468-484)."""
    return decode_png_rgb(open(path_file_image, "rb").read()).astype(np.float32)


def decode_png_rgb(data: bytes) -> np.ndarray:
    """Decode PNG bytes to (H, W, 3) uint8."""
    from PIL import Image

    img = Image.open(io.BytesIO(data)).convert("RGB")
    return np.asarray(img, dtype=np.uint8)


def decode_png_mask(data: bytes) -> np.ndarray:
    """Decode a single-channel class-map PNG to (H, W) uint8 (first channel,
    transparency ignored — reference datacoder.py:330-331)."""
    from PIL import Image

    img = Image.open(io.BytesIO(data))
    arr = np.asarray(img)
    if arr.ndim == 3:
        arr = arr[..., 0]
    return arr.astype(np.uint8)


def read_labels_boxes_csv(path_or_text: str) -> Tuple[np.ndarray, np.ndarray]:
    """Parse a ground-truth CSV of rows (label, xmin, ymin, xmax, ymax).

    The reference splits the raw file on CRLF (datacoder.py:194-196); the
    csv module handles both line endings.
    Returns (labels (G,), boxes (G, 4) corners).
    """
    # path-vs-text disambiguation: treat the string as inline CSV text
    # when it cannot be a path (embedded newline, overlong, empty) or when
    # it is comma-bearing AND no such file exists (commas are legal in
    # file names, so an existing comma-bearing path is still opened) — a
    # plain missing-file path must surface as FileNotFoundError, not as a
    # downstream int() parse error on the path string itself
    looks_like_text = (
        "\n" in path_or_text
        or "\r" in path_or_text
        or len(path_or_text) > 4096
        or path_or_text == ""
        or ("," in path_or_text and not os.path.exists(path_or_text))
    )
    if looks_like_text and "\n" not in path_or_text and "\r" not in path_or_text:
        # single-line comma-bearing string that is not an existing file:
        # if it still looks like a path (csv suffix / path separator), a
        # typo'd path like 'data/run,v2.csv' must fail as a missing file,
        # not as a confusing int() parse error on the path string
        if path_or_text.endswith(".csv") or os.sep in path_or_text:
            raise FileNotFoundError(path_or_text)
    if looks_like_text:
        text = path_or_text
    else:
        text = open(path_or_text, "r", newline="").read()
    labels, boxes = [], []
    for row in _csv.reader(io.StringIO(text.strip())):
        if not row:
            continue
        labels.append(int(row[0]))
        boxes.append([float(v) for v in row[1:5]])
    return (
        np.asarray(labels, dtype=np.int32),
        np.asarray(boxes, dtype=np.float32).reshape(-1, 4),
    )


def pad_ground_truth(
    labels: np.ndarray, boxes: np.ndarray, max_boxes: int
) -> Tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Pad ragged ground truth to the fixed device budget + validity mask."""
    g = min(len(labels), max_boxes)
    out_labels = np.zeros((max_boxes,), dtype=np.int32)
    out_boxes = np.zeros((max_boxes, 4), dtype=np.float32)
    out_valid = np.zeros((max_boxes,), dtype=bool)
    out_labels[:g] = labels[:g]
    out_boxes[:g] = boxes[:g]
    out_valid[:g] = True
    return out_labels, out_boxes, out_valid


def flip_boxes_horizontal(
    boxes: jnp.ndarray, image_width: float
) -> jnp.ndarray:
    """Horizontal flip of corner boxes: xmin' = W - xmax, xmax' = W - xmin.

    Uses the raw image width like the reference (datacoder.py:202-203) —
    not width - 1.
    """
    return jnp.stack(
        [
            image_width - boxes[..., 2],
            boxes[..., 1],
            image_width - boxes[..., 0],
            boxes[..., 3],
        ],
        axis=-1,
    )


def make_train_batch_transform(
    anchors: Anchors,
    cfg: EncodingConfig,
    augmentation_horizontal_flip: bool = False,
    augmentation_rgb: bool = False,
):
    """Build the (pure, unjitted) device-side batch transform.

    ``fn(key, images_u8, masks_u8, gt_labels, gt_boxes, gt_valid)``
    -> ``(images_f32, {'output-mask', 'output-labels', 'output-boxes'})``
    where images are (B, H, W, 3) uint8, masks (B, H, W) uint8 class maps
    and the ground truth is padded per `pad_ground_truth`.

    Returned unjitted so callers can inline it into a larger jit program —
    fusing it into the train step (train.Trainer) runs transform + step as
    ONE executable, which matters on remote-attached TPUs where every
    dispatch carries fixed host-link overhead.
    """
    anchors_corners = jnp.asarray(anchors.corners)
    image_width = float(cfg.image_shape[1])
    encode = functools.partial(
        enc_ops.encode_sample,
        num_classes=cfg.num_classes,
        iou_threshold=cfg.iou_threshold,
        standard_deviations=cfg.standard_deviations,
    )

    def process(key, images_u8, masks_u8, gt_labels, gt_boxes, gt_valid):
        b = images_u8.shape[0]
        images = images_u8.astype(jnp.float32)
        masks = jax.nn.one_hot(masks_u8, cfg.num_classes, dtype=jnp.float32)

        if augmentation_horizontal_flip:
            key, k_flip = jax.random.split(key)
            # per-sample coin with the reference's >= 0.5 convention
            # (datacoder.py:337)
            flip = jax.random.uniform(k_flip, (b,)) >= 0.5
            images = jnp.where(
                flip[:, None, None, None], images[:, :, ::-1, :], images
            )
            masks = jnp.where(flip[:, None, None, None], masks[:, :, ::-1, :], masks)
            gt_boxes = jnp.where(
                flip[:, None, None],
                flip_boxes_horizontal(gt_boxes, image_width),
                gt_boxes,
            )

        if augmentation_rgb:
            key, k_rgb = jax.random.split(key)
            images = color_ops.augmentation_rgb_channels(k_rgb, images)

        labels, offsets = jax.vmap(
            lambda l, bx, v: encode(l, bx, v, anchors_corners)
        )(gt_labels, gt_boxes, gt_valid)

        return images, {
            "output-mask": masks,
            "output-labels": labels,
            "output-boxes": offsets,
        }

    return process


def make_train_batch_processor(
    anchors: Anchors,
    cfg: EncodingConfig,
    augmentation_horizontal_flip: bool = False,
    augmentation_rgb: bool = False,
):
    """Jitted standalone version of `make_train_batch_transform`."""
    return jax.jit(
        make_train_batch_transform(
            anchors, cfg, augmentation_horizontal_flip, augmentation_rgb
        )
    )


class DataEncoderDecoder:
    """Mirror of the reference `DataEncoderDecoder` (datacoder.py:5-432).

    Accepts anchors as corners, centroids, or both (same validation rules);
    `read_and_encode` does host IO + a single-sample device encode;
    `decode_to_centroids` / `decode_to_corners` invert the encoding.
    """

    def __init__(
        self,
        num_classes: int,
        image_shape: Tuple[int, int],
        xmin_boxes_default=None,
        ymin_boxes_default=None,
        xmax_boxes_default=None,
        ymax_boxes_default=None,
        center_x_boxes_default=None,
        center_y_boxes_default=None,
        width_boxes_default=None,
        height_boxes_default=None,
        iou_threshold: float = 0.5,
        standard_deviations_centroids_offsets=(0.1, 0.1, 0.2, 0.2),
        augmentation_horizontal_flip: bool = False,
        max_ground_truth_boxes: int = 32,
        seed: int = 0,
    ) -> None:
        corners = (xmin_boxes_default, ymin_boxes_default,
                   xmax_boxes_default, ymax_boxes_default)
        centroids = (center_x_boxes_default, center_y_boxes_default,
                     width_boxes_default, height_boxes_default)

        if all(c is None for c in centroids):
            if any(c is None for c in corners):
                raise ValueError(
                    "you must pass all default bounding boxes corners coordinates!"
                )
            corners_np = np.stack(
                [np.asarray(c, np.float32) for c in corners], axis=-1
            )
        elif all(c is None for c in corners):
            if any(c is None for c in centroids):
                raise ValueError(
                    "you must pass all default bounding boxes centroids coordinates!"
                )
            cents = [np.asarray(c, np.float32) for c in centroids]
            corners_np = np.stack(
                coordinates_centroids_to_corners(*cents), axis=-1
            )
        elif all(c is not None for c in corners) and all(
            c is not None for c in centroids
        ):
            corners_np = np.stack(
                [np.asarray(c, np.float32) for c in corners], axis=-1
            )
        else:
            raise ValueError(
                "you must pass all default bounding boxes centroids coordinates, "
                "or corners coordinates or both!"
            )

        self.anchors = Anchors(
            corners=corners_np,
            centroids=np.stack(
                enc_ops.coordinates_corners_to_centroids(
                    corners_np[:, 0], corners_np[:, 1],
                    corners_np[:, 2], corners_np[:, 3],
                ),
                axis=-1,
            ),
        )
        # reference-compatible attribute surface
        self.num_classes = num_classes
        self.image_height, self.image_width = image_shape
        self.iou_threshold = iou_threshold
        (
            self.standard_deviation_center_x_offsets,
            self.standard_deviation_center_y_offsets,
            self.standard_deviation_width_offsets,
            self.standard_deviation_height_offsets,
        ) = standard_deviations_centroids_offsets
        self.xmin_boxes_default = self.anchors.xmin
        self.ymin_boxes_default = self.anchors.ymin
        self.xmax_boxes_default = self.anchors.xmax
        self.ymax_boxes_default = self.anchors.ymax
        self.center_x_boxes_default = self.anchors.center_x
        self.center_y_boxes_default = self.anchors.center_y
        self.width_boxes_default = self.anchors.width
        self.height_boxes_default = self.anchors.height
        self.augmentation_horizontal_flip = augmentation_horizontal_flip

        self.config = EncodingConfig(
            num_classes=num_classes,
            image_shape=tuple(image_shape),
            iou_threshold=iou_threshold,
            standard_deviations=tuple(standard_deviations_centroids_offsets),
            max_ground_truth_boxes=max_ground_truth_boxes,
        )
        self._rng = np.random.default_rng(seed)
        self._encode_batch = enc_ops.make_batch_encoder(self.anchors, self.config)
        # content fingerprint of the encoding function for the shared
        # sample-cache: two coders with different anchors/config must not
        # share encoded entries
        import hashlib

        self._encode_fingerprint = hashlib.blake2b(
            corners_np.tobytes()
            + repr(
                (
                    num_classes,
                    tuple(image_shape),
                    iou_threshold,
                    tuple(standard_deviations_centroids_offsets),
                    max_ground_truth_boxes,
                )
            ).encode(),
            digest_size=8,
        ).hexdigest()

    # -- encoding ---------------------------------------------------------
    def encode_ground_truth(
        self,
        labels: np.ndarray,
        boxes_corners: np.ndarray,
        flip_horizontal: bool = False,
    ) -> Tuple[np.ndarray, np.ndarray]:
        """Encode one sample's ragged ground truth.

        Functional equivalent of reference
        `_encode_ground_truth_labels_boxes` (datacoder.py:177-300), minus
        the file IO.  Returns (labels (N, C), offsets (N, 4)).
        """
        boxes_corners = np.asarray(boxes_corners, np.float32).reshape(-1, 4)
        if flip_horizontal:
            boxes_corners = np.asarray(
                flip_boxes_horizontal(boxes_corners, float(self.image_width))
            )
        gl, gb, gv = pad_ground_truth(
            np.asarray(labels, np.int32),
            boxes_corners,
            self.config.max_ground_truth_boxes,
        )
        enc_labels, enc_offsets = self._encode_batch(
            gl[None], gb[None], gv[None]
        )
        return np.asarray(enc_labels[0]), np.asarray(enc_offsets[0])

    def _load_decoded(self, path_file_image, path_file_mask, path_file_labels_boxes):
        """Decoded (image u8, mask u8 map, padded gt) through the
        process-wide sample cache — decode is a pure function of the files,
        so epoch >= 2 costs lookups, not zlib inflate + CSV parse.  Returns
        (stat_key_or_None, (image, mask, gl, gb, gv)); cached arrays are
        immutable (callers copy before flipping)."""
        cache = _sample_cache.global_sample_cache()
        stat = (
            cache.stat_key(path_file_image, path_file_mask, path_file_labels_boxes)
            if cache.enabled
            else None
        )
        max_gt = self.config.max_ground_truth_boxes
        if stat is not None:
            hit = cache.get(("decoded", max_gt, stat))
            if hit is not None:
                return stat, hit
        image = decode_png_rgb(open(path_file_image, "rb").read())
        mask_map = decode_png_mask(open(path_file_mask, "rb").read())
        labels, boxes = read_labels_boxes_csv(path_file_labels_boxes)
        gl, gb, gv = pad_ground_truth(labels, boxes, max_gt)
        value = (image, mask_map, gl, gb, gv)
        if stat is not None:
            cache.put(("decoded", max_gt, stat), value)
        return stat, value

    def _encode_padded(self, gl, gb, gv, flip: bool):
        """Encode one padded sample; returns (labels (N, C) f32 one-hot,
        offsets (N, 4) f32).  Padded slots are masked by `gv` inside the
        matcher (ops/encoding.py match_anchors), so flipping the zero
        padding rows is harmless."""
        if flip:
            gb = np.asarray(
                flip_boxes_horizontal(gb, float(self.image_width))
            )
        el, eo = self._encode_batch(gl[None], gb[None], gv[None])
        return np.asarray(el[0]), np.asarray(eo[0])

    def _encode_padded_cached(self, stat, gl, gb, gv, flip: bool):
        """`_encode_padded` through the sample cache, keyed by (sample
        files, flip, encoder fingerprint): anchor matching is deterministic
        given the flip bit, so both variants memoize.  Exactly-one-hot
        labels are stored packed as uint8 class indices (the common case —
        the encoder emits background one-hot for unmatched anchors); the
        zero-row corner case (a GT label outside [0, num_classes), outside
        the reference data model) stores f32.
        Returns (enc_labels_f32, enc_offsets, labels_u8_or_None)."""
        cache = _sample_cache.global_sample_cache()
        key = (
            ("encoded", self._encode_fingerprint, flip, stat)
            if stat is not None
            else None
        )
        if key is not None:
            hit = cache.get(key)
            if hit is not None:
                tag, packed, offsets = hit
                if tag == "u8":
                    labels = (
                        packed[..., None]
                        == np.arange(self.num_classes, dtype=packed.dtype)
                    ).astype(np.float32)
                    return labels, offsets, packed
                return packed, offsets, None
        labels, offsets = self._encode_padded(gl, gb, gv, flip)
        sums = labels.sum(axis=-1)
        if ((sums == 1.0).all()
                and ((labels == 0.0) | (labels == 1.0)).all()
                and self.num_classes <= 255):
            labels_u8 = labels.argmax(axis=-1).astype(np.uint8)
            if key is not None:
                cache.put(key, ("u8", labels_u8, offsets))
            return labels, offsets, labels_u8
        if key is not None:
            cache.put(key, ("f32", labels, offsets))
        return labels, offsets, None

    def _read_and_encode_raw(
        self, path_file_image, path_file_mask, path_file_labels_boxes
    ):
        """Shared IO + flip + encode; returns (image u8, mask u8 class map,
        enc_labels f32, enc_offsets f32, labels_u8_or_None)."""
        stat, (image, mask_map, gl, gb, gv) = self._load_decoded(
            path_file_image, path_file_mask, path_file_labels_boxes
        )
        flip = bool(
            self.augmentation_horizontal_flip and self._rng.uniform() >= 0.5
        )
        if flip:
            image = image[:, ::-1, :].copy()
            mask_map = mask_map[:, ::-1].copy()
        enc_labels, enc_offsets, labels_u8 = self._encode_padded_cached(
            stat, gl, gb, gv, flip
        )
        return image, mask_map, enc_labels, enc_offsets, labels_u8

    def read_and_encode(
        self,
        path_file_image: str,
        path_file_mask: str,
        path_file_labels_boxes: str,
    ) -> Tuple[np.ndarray, Dict[str, np.ndarray]]:
        """Host IO + encode for one sample (reference datacoder.py:302-347).

        Returns (image float32 (H, W, 3),
                 {'output-mask' one-hot, 'output-labels', 'output-boxes'}).
        """
        image_u8, mask_map, enc_labels, enc_offsets, _ = (
            self._read_and_encode_raw(
                path_file_image, path_file_mask, path_file_labels_boxes
            )
        )
        # tf.one_hot semantics (reference datacoder.py:330): out-of-range
        # pixel values produce an all-zero row, matching the jitted batch
        # path (jax.nn.one_hot) — np.eye indexing would IndexError instead
        mask = (
            mask_map[..., None] == np.arange(self.num_classes, dtype=mask_map.dtype)
        ).astype(np.float32)
        return image_u8.astype(np.float32), {
            "output-mask": mask,
            "output-labels": enc_labels,
            "output-boxes": enc_offsets,
        }

    def read_and_encode_packed(
        self,
        path_file_image: str,
        path_file_mask: str,
        path_file_labels_boxes: str,
    ) -> Tuple[np.ndarray, np.ndarray, np.ndarray, np.ndarray]:
        """`read_and_encode` in the packed wire format: (image uint8
        (H, W, 3), mask uint8 class map (H, W), labels uint8 class indices
        (N,), offsets float32 (N, 4)).

        Every packed tensor one-hots back to the exact `read_and_encode`
        output (the reference encoder emits exact {0,1} one-hot — reference
        datacoder.py:247-248, :333), at 16x less mask bandwidth through the
        tf.data pipeline and the host->device link; the `ssdseglib` compat
        facade re-one-hots ON DEVICE inside the jitted train step.  Same
        flip-RNG stream as `read_and_encode`."""
        image, mask_map, enc_labels, enc_offsets, labels_u8 = (
            self._read_and_encode_raw(
                path_file_image, path_file_mask, path_file_labels_boxes
            )
        )
        if labels_u8 is None:
            raise ValueError(
                "packed pipeline needs exactly-one-hot encoded labels (a "
                "ground-truth label is outside [0, num_classes)); set "
                "SSDSEGLIB_PACKED_PIPELINE=0 for the float32 path"
            )
        return image, mask_map, labels_u8, enc_offsets

    # -- decoding ---------------------------------------------------------
    def decode_to_centroids(
        self, offsets_centroids, output_decoded_centroids_separately: bool = False
    ):
        """Decode GT offsets to centroids (reference datacoder.py:349-388)."""
        cent = enc_ops.decode_offsets_to_centroids(
            jnp.asarray(offsets_centroids),
            jnp.asarray(self.anchors.centroids),
            self.config.standard_deviations,
            zero_background=True,
        )
        if output_decoded_centroids_separately:
            return cent[..., 0], cent[..., 1], cent[..., 2], cent[..., 3]
        return cent

    def decode_to_corners(
        self, offsets_centroids, output_decoded_corners_separately: bool = False
    ):
        """Decode GT offsets to corners (reference datacoder.py:390-432)."""
        corners = enc_ops.decode_offsets_to_corners(
            jnp.asarray(offsets_centroids),
            jnp.asarray(self.anchors.centroids),
            self.config.standard_deviations,
            zero_background=True,
        )
        if output_decoded_corners_separately:
            return corners[..., 0], corners[..., 1], corners[..., 2], corners[..., 3]
        return corners


def augmentation_rgb_channels(image_batch, targets_batch, key: Optional[jax.Array] = None):
    """Batch color augmentation (reference datacoder.py:434-466).

    Functional mirror; pass a jax PRNG key (a fresh one is drawn from the
    default generator when omitted, for API compatibility).
    """
    if key is None:
        key = jax.random.key(np.random.default_rng().integers(2**31))
    return color_ops.augmentation_rgb_channels(key, jnp.asarray(image_batch)), targets_batch
