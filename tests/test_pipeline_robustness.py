"""Input-pipeline failure-path tests: producer errors must surface (not
hang), the native loader must fall back to PIL per batch, and the host
single-sample path must match the device batch path on degenerate masks."""

import numpy as np
import pytest

from ssdseglib_tpu.data.pipeline import HostBatcher
from ssdseglib_tpu.datacoder import read_labels_boxes_csv


def _write_sample(tmp_path, i, h=16, w=24, mask_values=(0, 3)):
    from PIL import Image

    rng = np.random.default_rng(i)
    image = rng.integers(0, 256, size=(h, w, 3), dtype=np.uint8)
    mask = rng.choice(mask_values, size=(h, w)).astype(np.uint8)
    ip, mp, cp = (
        str(tmp_path / f"i{i}.png"),
        str(tmp_path / f"m{i}.png"),
        str(tmp_path / f"c{i}.csv"),
    )
    Image.fromarray(image).save(ip)
    Image.fromarray(mask, mode="L").save(mp)
    open(cp, "w").write("1,2.0,3.0,10.0,12.0")
    return ip, mp, cp


def test_producer_error_propagates_not_hangs(tmp_path):
    """A missing file mid-epoch must raise in the consumer — the producer
    thread used to die silently, leaving the consumer blocked in q.get()
    forever."""
    triples = [_write_sample(tmp_path, i) for i in range(4)]
    triples.append(
        (str(tmp_path / "missing.png"), triples[0][1], triples[0][2])
    )
    batcher = HostBatcher(
        triples, batch_size=1, shuffle=False, image_shape=(16, 24)
    )
    with pytest.raises(Exception) as exc_info:
        for _ in batcher:
            pass
    # either the PIL path's FileNotFoundError or (native-first path) the
    # fallback PIL error — never a hang, never a silent stop
    assert isinstance(exc_info.value, (FileNotFoundError, OSError))


def test_early_consumer_exit_unblocks_producer(tmp_path):
    """Breaking out of an epoch must let the producer thread exit instead
    of leaving it blocked forever in q.put() on the full prefetch queue."""
    import threading
    import time

    triples = [_write_sample(tmp_path, i) for i in range(8)]
    before = {t.ident for t in threading.enumerate()}
    batcher = HostBatcher(
        triples, batch_size=1, shuffle=False, image_shape=(16, 24),
        prefetch=1,
    )
    for _ in batcher:
        break  # abandon the epoch with the queue full
    deadline = time.time() + 5.0
    while time.time() < deadline:
        new_alive = [
            t
            for t in threading.enumerate()
            if t.ident not in before and t.is_alive()
        ]
        if not new_alive:
            break
        time.sleep(0.05)
    else:
        pytest.fail(f"producer never exited: {threading.enumerate()}")


def test_native_falls_back_to_pil_per_batch(tmp_path):
    """A PNG the native decoder rejects (16-bit) must be served through
    the PIL path for that batch instead of failing the epoch
    (native_loader.py documents the catch-and-fall-back contract)."""
    from PIL import Image

    native = pytest.importorskip("ssdseglib_tpu.data.native_loader")
    if not native.available():
        pytest.skip("native library unavailable")

    triples = [_write_sample(tmp_path, i) for i in range(3)]
    # a 16-bit grayscale image PNG: PIL decodes it, the native loader
    # returns -15 (bit depth)
    arr16 = (np.arange(16 * 24, dtype=np.uint16) % 65535).reshape(16, 24)
    ip = str(tmp_path / "deep.png")
    Image.fromarray(arr16).save(ip)  # mode I;16 inferred from uint16
    triples.append((ip, triples[0][1], triples[0][2]))

    batcher = HostBatcher(
        triples, batch_size=1, shuffle=False, image_shape=(16, 24)
    )
    if batcher._native is None:
        pytest.skip("native loader not active for this batcher")
    with pytest.warns(UserWarning, match="falling back"):
        batches = list(batcher)
    assert len(batches) == 4
    for images, masks, gl, gb, gv in batches:
        assert images.shape == (1, 16, 24, 3)


def test_read_csv_missing_path_raises_filenotfound(tmp_path):
    """A mistyped CSV path must surface as FileNotFoundError, not be
    silently reinterpreted as CSV text (which produced a baffling int()
    parse error on the path string)."""
    with pytest.raises(FileNotFoundError):
        read_labels_boxes_csv(str(tmp_path / "does_not_exist.csv"))
    # inline CSV text (contains commas/newlines) still parses
    labels, boxes = read_labels_boxes_csv("1,2,3,4,5\r\n2,6,7,8,9")
    np.testing.assert_array_equal(labels, [1, 2])
    np.testing.assert_allclose(boxes[1], [6, 7, 8, 9])


def test_read_csv_comma_bearing_path_and_empty_text(tmp_path):
    """Commas are legal in file names: an EXISTING comma-bearing path is
    opened as a file (not parsed as inline text), and the empty string
    keeps its 'no boxes' meaning."""
    path = tmp_path / "run,v2.csv"
    path.write_text("3,1.0,2.0,5.0,6.0\n")
    labels, boxes = read_labels_boxes_csv(str(path))
    np.testing.assert_array_equal(labels, [3])
    np.testing.assert_allclose(boxes[0], [1.0, 2.0, 5.0, 6.0])

    labels, boxes = read_labels_boxes_csv("")
    assert labels.shape == (0,) and boxes.shape == (0, 4)

    # a MISSING comma-bearing string that still looks like a path (.csv
    # suffix / path separator) is a typo'd path: FileNotFoundError, not a
    # confusing int() parse error from inline-text interpretation
    with pytest.raises(FileNotFoundError):
        read_labels_boxes_csv(str(tmp_path / "run,v2.csv") + ".missing.csv")
    with pytest.raises(FileNotFoundError):
        read_labels_boxes_csv("data/run,v2.csv")


def test_native_io_error_skips_format_fallback_warning(tmp_path):
    """A missing file through the native-first path must surface the
    precise FileNotFoundError WITHOUT the misleading 'falling back to the
    PIL path' format warning (IO failures are not a decoder limitation)."""
    import warnings

    native = pytest.importorskip("ssdseglib_tpu.data.native_loader")
    if not native.available():
        pytest.skip("native library unavailable")

    triples = [_write_sample(tmp_path, i) for i in range(2)]
    triples.append(
        (str(tmp_path / "gone.png"), triples[0][1], triples[0][2])
    )
    batcher = HostBatcher(
        triples, batch_size=1, shuffle=False, image_shape=(16, 24)
    )
    if batcher._native is None:
        pytest.skip("native loader not active for this batcher")
    with warnings.catch_warnings(record=True) as caught:
        warnings.simplefilter("always")
        with pytest.raises((FileNotFoundError, OSError)):
            for _ in batcher:
                pass
    assert not any("falling back" in str(w.message) for w in caught)


def test_read_and_encode_out_of_range_mask_pixel(tmp_path):
    """tf.one_hot semantics: a mask pixel >= num_classes one-hots to an
    all-zero row (the np.eye formulation crashed with IndexError),
    matching the jitted batch path."""
    from ssdseglib_tpu.boxes import Anchors
    from ssdseglib_tpu.config import AnchorsConfig
    from ssdseglib_tpu.datacoder import DataEncoderDecoder

    ip, mp, cp = _write_sample(tmp_path, 0, mask_values=(0, 255))
    anchors = Anchors.from_config(
        AnchorsConfig(
            feature_maps_shapes=((2, 3),),
            feature_maps_aspect_ratios=((1.0,),),
            boxes_scales=(0.3, 0.8),
            centers_padding_from_borders=(0.05,),
            additional_square_box=False,
        ),
        (16, 24),
    )
    coder = DataEncoderDecoder(
        num_classes=4,
        image_shape=(16, 24),
        xmin_boxes_default=anchors.xmin,
        ymin_boxes_default=anchors.ymin,
        xmax_boxes_default=anchors.xmax,
        ymax_boxes_default=anchors.ymax,
        iou_threshold=0.5,
        standard_deviations_centroids_offsets=(0.1, 0.1, 0.2, 0.2),
    )
    image, targets = coder.read_and_encode(ip, mp, cp)
    mask = targets["output-mask"]
    assert mask.shape == (16, 24, 4)
    # pixels valued 255 one-hot to all-zero rows; pixels 0 to class 0
    rowsum = mask.sum(axis=-1)
    assert set(np.unique(rowsum)) <= {0.0, 1.0}
    assert (rowsum == 0.0).any() and (rowsum == 1.0).any()
