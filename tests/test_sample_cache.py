"""Cross-epoch sample cache + packed tf.data wire format (round 5).

Covers utils/sample_cache.py (bytes-bounded LRU, file-identity keys),
the cached/packed `DataEncoderDecoder.read_and_encode[_packed]` paths
(ssdseglib_tpu/datacoder.py), the `HostBatcher` decode memo
(data/pipeline.py), and the compat facade's pre-packed batch handling +
content-keyed device cache (ssdseglib/models.py, ssdseglib/datacoder.py).
"""

import os

import numpy as np
import pytest

from ssdseglib_tpu.utils.sample_cache import SampleCache, global_sample_cache


# ---------------------------------------------------------------- fixtures

@pytest.fixture()
def dataset(tmp_path):
    """Small on-disk dataset: 6 PNG/PNG/CSV triples at 96x128."""
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
            str(tmp_path / f"img{i}.png"),
            str(tmp_path / f"mask{i}.png"),
            str(tmp_path / f"boxes{i}.csv"),
        )
        Image.fromarray(image).save(pi)
        Image.fromarray(mask).save(pm)
        with open(pl, "w") as f:
            f.write(f"{label},{x0},{y0},{x0 + w // 3 - 1},{y0 + h // 3 - 1}\r\n")
        triples.append((pi, pm, pl))
    return triples


def make_coder(flip=False, seed=0):
    from ssdseglib_tpu.boxes import DefaultBoundingBoxes
    from ssdseglib_tpu.datacoder import DataEncoderDecoder

    dbb = DefaultBoundingBoxes(
        feature_maps_shapes=((6, 8), (3, 4)),
        centers_padding_from_borders_percentage=(0.025, 0.05),
        boxes_scales=(0.2, 0.9),
        additional_square_box=True,
    )
    dbb.rescale_boxes_coordinates(image_shape=(96, 128))
    return DataEncoderDecoder(
        num_classes=4,
        image_shape=(96, 128),
        xmin_boxes_default=dbb.get_boxes_coordinates_xmin(coordinates_style="ssd"),
        ymin_boxes_default=dbb.get_boxes_coordinates_ymin(coordinates_style="ssd"),
        xmax_boxes_default=dbb.get_boxes_coordinates_xmax(coordinates_style="ssd"),
        ymax_boxes_default=dbb.get_boxes_coordinates_ymax(coordinates_style="ssd"),
        iou_threshold=0.5,
        augmentation_horizontal_flip=flip,
        seed=seed,
    )


# ------------------------------------------------------------ SampleCache

def test_lru_bytes_bound_and_eviction():
    cache = SampleCache(max_bytes=3000)
    a = np.zeros(1000, np.uint8)
    for i in range(4):
        cache.put(("k", i), a.copy())
    assert len(cache) == 3  # 4000 bytes > bound: oldest evicted
    assert cache.get(("k", 0)) is None
    assert cache.get(("k", 3)) is not None
    # touching an entry protects it from the next eviction
    cache.get(("k", 1))
    cache.put(("k", 9), a.copy())
    assert cache.get(("k", 1)) is not None
    assert cache.get(("k", 2)) is None


def test_oversized_entry_rejected():
    cache = SampleCache(max_bytes=100)
    cache.put("big", np.zeros(1000, np.uint8))
    assert cache.get("big") is None


def test_disabled_cache_noops():
    cache = SampleCache(max_bytes=0)
    cache.put("x", np.zeros(10))
    assert cache.get("x") is None and not cache.enabled


def test_stat_key_binds_file_identity(tmp_path):
    cache = SampleCache(max_bytes=1 << 20)
    p = str(tmp_path / "f.bin")
    open(p, "wb").write(b"abc")
    k1 = cache.stat_key(p)
    open(p, "wb").write(b"abcdef")  # size change -> new identity
    k2 = cache.stat_key(p)
    assert k1 != k2
    assert cache.stat_key(str(tmp_path / "missing")) is None


# ------------------------------------------- DataEncoderDecoder caching

def test_read_and_encode_cached_is_identical(dataset):
    global_sample_cache().clear()
    coder = make_coder(flip=False)
    first = [coder.read_and_encode(*t) for t in dataset]
    assert global_sample_cache().hits == 0
    second = [coder.read_and_encode(*t) for t in dataset]
    assert global_sample_cache().hits > 0  # epoch 2 served from RAM
    for (i1, t1), (i2, t2) in zip(first, second):
        np.testing.assert_array_equal(i1, i2)
        for k in t1:
            np.testing.assert_array_equal(t1[k], t2[k])


def test_packed_matches_unpacked_bit_exact(dataset):
    """One-hot of the packed wire == the reference-parity f32 output,
    including under the flip RNG stream (same seed => same flips)."""
    global_sample_cache().clear()
    a = make_coder(flip=True, seed=7)
    b = make_coder(flip=True, seed=7)
    for t in dataset:
        image_f, targets = a.read_and_encode(*t)
        image_u, mask_u, labels_u, offsets = b.read_and_encode_packed(*t)
        assert image_u.dtype == np.uint8
        assert mask_u.dtype == np.uint8 and mask_u.ndim == 2
        assert labels_u.dtype == np.uint8
        np.testing.assert_array_equal(image_u.astype(np.float32), image_f)
        onehot = lambda m: (
            m[..., None] == np.arange(4, dtype=m.dtype)
        ).astype(np.float32)
        np.testing.assert_array_equal(onehot(mask_u), targets["output-mask"])
        np.testing.assert_array_equal(
            onehot(labels_u), targets["output-labels"]
        )
        np.testing.assert_array_equal(offsets, targets["output-boxes"])


def test_cache_invalidates_on_file_change(dataset, tmp_path):
    from PIL import Image

    global_sample_cache().clear()
    coder = make_coder()
    pi, pm, pl = dataset[0]
    img1, _ = coder.read_and_encode(pi, pm, pl)
    # rewrite the image with different content (different size on disk)
    new = np.full((96, 128, 3), 7, dtype=np.uint8)
    Image.fromarray(new).save(pi)
    img2, _ = coder.read_and_encode(pi, pm, pl)
    np.testing.assert_array_equal(img2, new.astype(np.float32))
    assert not np.array_equal(img1, img2)


def test_distinct_coder_configs_do_not_share_encodings(dataset):
    a = make_coder()
    b_coder = make_coder()
    # identical config -> shared encoded entries (same fingerprint)
    assert a._encode_fingerprint == b_coder._encode_fingerprint
    import ssdseglib_tpu.datacoder as dc

    # different iou_threshold -> different fingerprint, no sharing
    c = dc.DataEncoderDecoder(
        num_classes=4,
        image_shape=(96, 128),
        xmin_boxes_default=a.xmin_boxes_default,
        ymin_boxes_default=a.ymin_boxes_default,
        xmax_boxes_default=a.xmax_boxes_default,
        ymax_boxes_default=a.ymax_boxes_default,
        iou_threshold=0.9,
    )
    assert c._encode_fingerprint != a._encode_fingerprint


# ----------------------------------------------------- HostBatcher memo

def test_host_batcher_epoch2_from_cache(dataset):
    from ssdseglib_tpu.data.pipeline import HostBatcher

    global_sample_cache().clear()
    batcher = HostBatcher(
        dataset, batch_size=3, shuffle=False, image_shape=(96, 128)
    )
    e1 = [b for b in batcher]
    h0 = global_sample_cache().hits
    e2 = [b for b in batcher]
    assert global_sample_cache().hits > h0
    for b1, b2 in zip(e1, e2):
        for a1, a2 in zip(b1, b2):
            np.testing.assert_array_equal(a1, a2)


def test_host_batcher_cache_shared_with_datacoder(dataset):
    """The compat coder and HostBatcher key the same decode entries."""
    from ssdseglib_tpu.data.pipeline import HostBatcher

    global_sample_cache().clear()
    coder = make_coder()
    for t in dataset:
        coder.read_and_encode(*t)
    misses = global_sample_cache().misses
    batcher = HostBatcher(
        dataset, batch_size=3, shuffle=False, image_shape=(96, 128)
    )
    list(batcher)
    assert global_sample_cache().misses == misses  # all decode hits


def test_host_batcher_cache_off(dataset):
    from ssdseglib_tpu.data.pipeline import HostBatcher

    global_sample_cache().clear()
    batcher = HostBatcher(
        dataset,
        batch_size=3,
        shuffle=False,
        image_shape=(96, 128),
        use_sample_cache=False,
    )
    list(batcher)
    list(batcher)
    assert global_sample_cache().hits == 0


# --------------------------------------- compat facade packed batches

def test_packed_wire_and_facade_packing_subprocess():
    """Packed/unpacked tf.data wire + `_pack_host_batch` + content-keyed
    device cache — in a SUBPROCESS, because these import the compat
    `ssdseglib` package whose module name collides with the reference
    oracle the in-process session loads (tests/conftest.py).  Same
    isolation rule as test_ssdseglib_compat.py."""
    import subprocess
    import sys
    from pathlib import Path

    script = Path(__file__).parent / "compat_scripts" / "packed_wire_checks.py"
    result = subprocess.run(
        [sys.executable, str(script)], capture_output=True, text=True,
        timeout=1200, cwd="/root/repo",
    )
    assert result.returncode == 0, (
        f"rc={result.returncode}\n--- stdout ---\n{result.stdout[-4000:]}"
        f"\n--- stderr ---\n{result.stderr[-4000:]}"
    )
    assert "PACKED_WIRE_CHECKS_OK" in result.stdout, result.stdout[-2000:]
