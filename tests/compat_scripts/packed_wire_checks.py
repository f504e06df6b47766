"""Subprocess driver: packed/unpacked tf.data wire format + facade batch
packing + content-keyed device cache (round 5).

Runs in its own process because it imports the COMPAT `ssdseglib`
package, whose module name collides with the reference oracle the
in-process test session loads (tests/conftest.py `reference` fixture) —
same isolation rule as the other compat_scripts.
"""

import os
import sys
import tempfile

sys.path.insert(0, "/root/repo")

import jax

jax.config.update("jax_platforms", "cpu")

import numpy as np


def make_dataset(root):
    from PIL import Image

    rng = np.random.default_rng(3)
    triples = []
    for i in range(6):
        h, w = 96, 128
        image = rng.integers(0, 256, (h, w, 3), dtype=np.uint8)
        mask = np.zeros((h, w), dtype=np.uint8)
        label = int(rng.integers(1, 4))
        y0, x0 = int(rng.integers(0, h // 2)), int(rng.integers(0, w // 2))
        mask[y0 : y0 + h // 3, x0 : x0 + w // 3] = label
        pi, pm, pl = (
            f"{root}/img{i}.png",
            f"{root}/mask{i}.png",
            f"{root}/boxes{i}.csv",
        )
        Image.fromarray(image).save(pi)
        Image.fromarray(mask).save(pm)
        with open(pl, "w") as f:
            f.write(
                f"{label},{x0},{y0},{x0 + w // 3 - 1},{y0 + h // 3 - 1}\r\n"
            )
        triples.append((pi, pm, pl))
    return triples


def make_coder(ssdseglib, flip=True):
    from ssdseglib_tpu.boxes import DefaultBoundingBoxes

    dbb = DefaultBoundingBoxes(
        feature_maps_shapes=((6, 8), (3, 4)),
        centers_padding_from_borders_percentage=(0.025, 0.05),
        boxes_scales=(0.2, 0.9),
        additional_square_box=True,
    )
    dbb.rescale_boxes_coordinates(image_shape=(96, 128))
    return ssdseglib.datacoder.DataEncoderDecoder(
        num_classes=4,
        image_shape=(96, 128),
        xmin_boxes_default=dbb.get_boxes_coordinates_xmin(coordinates_style="ssd"),
        ymin_boxes_default=dbb.get_boxes_coordinates_ymin(coordinates_style="ssd"),
        xmax_boxes_default=dbb.get_boxes_coordinates_xmax(coordinates_style="ssd"),
        ymax_boxes_default=dbb.get_boxes_coordinates_ymax(coordinates_style="ssd"),
        iou_threshold=0.5,
        augmentation_horizontal_flip=flip,
    )


def build_ds(tf, ssdseglib, coder, triples):
    paths = list(zip(*triples))
    return (
        tf.data.Dataset.from_tensor_slices(
            (list(paths[0]), list(paths[1]), list(paths[2]))
        )
        .map(coder.read_and_encode)
        .batch(3)
        .map(ssdseglib.datacoder.augmentation_rgb_channels)
    )


def check_packed_wire(tf, ssdseglib, triples):
    from ssdseglib.models import _pack_host_batch

    coder = make_coder(ssdseglib)
    ds = build_ds(tf, ssdseglib, coder, triples)
    spec = ds.element_spec
    assert spec[0].dtype == tf.uint8, spec
    assert spec[1]["output-mask"].dtype == tf.uint8
    assert spec[1]["output-labels"].dtype == tf.uint8
    assert ssdseglib.datacoder.COLOR_AUG_SEED_KEY in spec[1]

    images, targets = next(iter(ds.as_numpy_iterator()))
    kind, flat = _pack_host_batch(images, targets)
    assert kind == (True, True, True), kind
    assert len(flat) == 5
    assert flat[0].dtype == np.uint8 and flat[1].dtype == np.uint8
    n = coder.anchors.total_boxes
    assert flat[2].shape == (3, n) and flat[3].shape == (3, n, 4)


def check_unpacked_wire(tf, ssdseglib, triples):
    from ssdseglib.models import _pack_host_batch

    os.environ["SSDSEGLIB_PACKED_PIPELINE"] = "0"
    try:
        coder = make_coder(ssdseglib)
        ds = build_ds(tf, ssdseglib, coder, triples)
        spec = ds.element_spec
        assert spec[0].dtype == tf.float32
        assert spec[1]["output-mask"].dtype == tf.float32
        assert spec[1]["output-mask"].shape[-1] == 4
        assert ssdseglib.datacoder.COLOR_AUG_SEED_KEY not in spec[1]

        images, targets = next(iter(ds.as_numpy_iterator()))
        kind, flat = _pack_host_batch(images, targets)
        assert kind[0] is True  # one-hot targets still certify + pack
        assert kind[2] is False  # no deferred color aug
        assert len(flat) == 4
    finally:
        del os.environ["SSDSEGLIB_PACKED_PIPELINE"]


def check_pack_host_batch_prepacked():
    from ssdseglib.datacoder import COLOR_AUG_SEED_KEY
    from ssdseglib.models import _pack_host_batch

    images = np.zeros((2, 8, 8, 3), np.uint8)
    targets = {
        "output-mask": np.zeros((2, 8, 8), np.uint8),
        "output-labels": np.zeros((2, 5), np.uint8),
        "output-boxes": np.zeros((2, 5, 4), np.float32),
        COLOR_AUG_SEED_KEY: np.int32(1234),
    }
    kind, flat = _pack_host_batch(images, targets)
    assert kind == (True, True, True)
    assert len(flat) == 5 and flat[4] == np.int32(1234)
    assert flat[1].dtype == np.uint8 and flat[2].dtype == np.uint8

    images = np.zeros((2, 8, 8, 3), np.float32)
    mask = np.zeros((2, 8, 8, 4), np.float32)
    mask[..., 0] = 1.0
    labels = np.zeros((2, 5, 4), np.float32)
    labels[..., 0] = 1.0
    kind, flat = _pack_host_batch(
        images,
        {
            "output-mask": mask,
            "output-labels": labels,
            "output-boxes": np.zeros((2, 5, 4), np.float32),
        },
    )
    assert kind == (True, True, False)
    assert len(flat) == 4

    # genuine uint8 ONE-HOT targets (rank 4/3) must NOT be misread as
    # class maps — they flow through unpacked, as before the packed wire
    kind, flat = _pack_host_batch(
        np.zeros((2, 8, 8, 3), np.uint8),
        {
            "output-mask": np.zeros((2, 8, 8, 4), np.uint8),
            "output-labels": np.zeros((2, 5, 4), np.uint8),
            "output-boxes": np.zeros((2, 5, 4), np.float32),
        },
    )
    assert kind[0] is False  # not packed: u8 one-hot fails the f32 gemm gate
    assert flat[1].shape == (2, 8, 8, 4)


def check_content_cache():
    from ssdseglib.datacoder import COLOR_AUG_SEED_KEY
    from ssdseglib.models import _DeviceBatchCache

    cache = _DeviceBatchCache(key_mode="content")
    mk = lambda: (
        np.arange(24, dtype=np.uint8).reshape(2, 3, 4),
        {
            "output-mask": np.ones((2, 3), np.uint8),
            "output-labels": np.zeros((2, 5), np.uint8),
            "output-boxes": np.zeros((2, 5, 4), np.float32),
        },
    )
    i1, t1 = mk()
    i2, t2 = mk()  # fresh arrays, same bytes
    k1, _ = cache.key_refs(i1, t1)
    k2, _ = cache.key_refs(i2, t2)
    assert k1 == k2
    cache.insert(k1, None, (True, True, False), (np.zeros(4),))
    assert cache.get(k2) is not None
    i3, t3 = mk()
    i3[0, 0, 0] = 99
    k3, _ = cache.key_refs(i3, t3)
    assert k3 != k1

    # a live per-batch jitter seed makes the batch differ every epoch:
    # such batches are NEVER cacheable (no key, no dead device entries)
    imgs = np.zeros((1, 2, 2, 3), np.uint8)
    t = lambda s: {
        "output-mask": np.zeros((1, 2, 2), np.uint8),
        "output-labels": np.zeros((1, 3), np.uint8),
        "output-boxes": np.zeros((1, 3, 4), np.float32),
        COLOR_AUG_SEED_KEY: np.int32(s),
    }
    ka, ra = cache.key_refs(imgs, t(1))
    assert ka is None and ra is None
    id_cache = _DeviceBatchCache(key_mode="id")
    kb, rb = id_cache.key_refs(imgs, t(2))
    assert kb is None and rb is None


def check_unflatten_applies_color_jitter():
    """The deferred color jitter is ACTUALLY applied from the seed leaf
    — exactly `ops/color.augmentation_rgb_channels(key(seed), f32)` —
    and the packed class maps one-hot back bit-exactly.  Guards against
    a silent seed drop (an e2e fit would still 'pass' without jitter)."""
    import jax

    from ssdseglib.models import make_unflatten
    from ssdseglib_tpu.ops import color as color_ops

    rng = np.random.default_rng(0)
    images = rng.integers(0, 256, (2, 8, 8, 3), dtype=np.uint8)
    mask = rng.integers(0, 4, (2, 8, 8), dtype=np.uint8)
    labels = rng.integers(0, 4, (2, 5), dtype=np.uint8)
    boxes = rng.normal(size=(2, 5, 4)).astype(np.float32)
    seed = np.int32(424242)

    unflatten = make_unflatten((True, True, True), 4)
    out_images, targets = unflatten(images, mask, labels, boxes, seed)

    expected = color_ops.augmentation_rgb_channels(
        jax.random.key(seed), images.astype(np.float32)
    )
    np.testing.assert_array_equal(np.asarray(out_images), np.asarray(expected))
    assert not np.array_equal(  # the jitter changed the pixels
        np.asarray(out_images), images.astype(np.float32)
    )
    onehot = lambda m: (
        m[..., None] == np.arange(4, dtype=m.dtype)
    ).astype(np.float32)
    np.testing.assert_array_equal(
        np.asarray(targets["output-mask"]), onehot(mask)
    )
    np.testing.assert_array_equal(
        np.asarray(targets["output-labels"]), onehot(labels)
    )
    np.testing.assert_array_equal(np.asarray(targets["output-boxes"]), boxes)

    # no-color-aug kind: images pass through as the plain f32 cast
    out_plain, _ = make_unflatten((True, True, False), 4)(
        images, mask, labels, boxes
    )
    np.testing.assert_array_equal(
        np.asarray(out_plain), images.astype(np.float32)
    )


def main():
    import tensorflow as tf

    import ssdseglib

    root = tempfile.mkdtemp()
    triples = make_dataset(root)
    check_packed_wire(tf, ssdseglib, triples)
    check_unpacked_wire(tf, ssdseglib, triples)
    check_pack_host_batch_prepacked()
    check_content_cache()
    check_unflatten_applies_color_jitter()
    print("PACKED_WIRE_CHECKS_OK")


if __name__ == "__main__":
    main()
