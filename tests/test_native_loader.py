"""Tests for the native C++ data-loader runtime (PNG/CSV decode vs PIL)."""

import io

import numpy as np
import pytest

from ssdseglib_tpu.data import native_loader

pytestmark = pytest.mark.skipif(
    not native_loader.available(), reason="native library unavailable"
)


def _png_bytes(arr: np.ndarray, mode: str) -> bytes:
    from PIL import Image

    buf = io.BytesIO()
    Image.fromarray(arr, mode=mode).save(buf, format="PNG")
    return buf.getvalue()


@pytest.mark.parametrize("mode,shape", [("RGB", (37, 53, 3)), ("RGBA", (24, 40, 4)),
                                        ("L", (33, 47))])
def test_png_decode_rgb_matches_pil(mode, shape):
    rng = np.random.default_rng(hash(mode) % 1000)
    arr = rng.integers(0, 256, size=shape, dtype=np.uint8)
    data = _png_bytes(arr, mode)

    from PIL import Image

    expected = np.asarray(Image.open(io.BytesIO(data)).convert("RGB"))
    decoded = native_loader.decode_png_rgb(data)
    np.testing.assert_array_equal(decoded, expected)


def test_png_decode_gray_class_map():
    rng = np.random.default_rng(0)
    class_map = rng.integers(0, 4, size=(61, 83)).astype(np.uint8)
    data = _png_bytes(class_map, "L")
    decoded = native_loader.decode_png_gray(data)
    np.testing.assert_array_equal(decoded, class_map)


def test_png_palette():
    from PIL import Image

    rng = np.random.default_rng(1)
    arr = rng.integers(0, 4, size=(16, 16)).astype(np.uint8)
    img = Image.fromarray(arr, mode="P")
    palette = [0] * 768
    for i, rgb in enumerate([(0, 0, 0), (255, 0, 0), (0, 255, 0), (0, 0, 255)]):
        palette[3 * i : 3 * i + 3] = rgb
    img.putpalette(palette)
    buf = io.BytesIO()
    img.save(buf, format="PNG")
    data = buf.getvalue()

    expected = np.asarray(Image.open(io.BytesIO(data)).convert("RGB"))
    decoded = native_loader.decode_png_rgb(data)
    np.testing.assert_array_equal(decoded, expected)


def test_csv_parse_crlf():
    text = b"1,10.5,20.0,30.25,40\r\n3,1,2,3,4\r\n"
    labels, boxes = native_loader.parse_csv(text)
    np.testing.assert_array_equal(labels, [1, 3])
    np.testing.assert_allclose(
        boxes, [[10.5, 20.0, 30.25, 40.0], [1, 2, 3, 4]]
    )


def test_csv_parse_ignores_bytes_past_len():
    """Regression: strtof on a non-NUL-terminated buffer used to keep
    consuming stale digit bytes past `len` (silently corrupting the final
    coordinate when the CSV lacks a trailing newline)."""
    import ctypes

    lib = native_loader.get_library()
    payload = b"1,10,20,30,40"  # no trailing newline
    buf = payload + b"987654"  # stale digit bytes past len
    labels = np.zeros(8, np.int32)
    boxes = np.zeros((8, 4), np.float32)
    rows = lib.ssdseg_csv_parse(
        buf,
        len(payload),
        labels.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        boxes.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        8,
    )
    assert rows == 1
    assert labels[0] == 1
    np.testing.assert_allclose(boxes[0], [10.0, 20.0, 30.0, 40.0])


def test_corrupt_ihdr_rejected_not_crash():
    """A PNG whose IHDR declares absurd dimensions must come back as an
    error code (the size arithmetic used to overflow size_t / bad_alloc
    could escape a pool thread and std::terminate the process)."""
    arr = np.zeros((8, 8, 3), np.uint8)
    data = bytearray(_png_bytes(arr, "RGB"))
    data[16:24] = b"\xff" * 8  # IHDR width/height -> 0xFFFFFFFF
    with pytest.raises(native_loader.NativeLoaderError):
        native_loader.png_info(bytes(data))
    with pytest.raises(native_loader.NativeLoaderError):
        native_loader.decode_png_rgb(bytes(data))


def test_png_info_header_only():
    rng = np.random.default_rng(5)
    arr = rng.integers(0, 256, size=(21, 35, 3), dtype=np.uint8)
    h, w, c = native_loader.png_info(_png_bytes(arr, "RGB"))
    assert (h, w, c) == (21, 35, 3)
    # truncated right after the IHDR chunk: info still works (header-only
    # parse), full decode correctly fails
    data = _png_bytes(arr, "RGB")[: 8 + 12 + 13]
    assert native_loader.png_info(data) == (21, 35, 3)
    with pytest.raises(native_loader.NativeLoaderError):
        native_loader.decode_png_rgb(data)


def test_batch_loader_end_to_end(tmp_path):
    """Native batch assembly matches the Python host path bit-for-bit."""
    from PIL import Image

    from ssdseglib_tpu.data.pipeline import _load_sample

    rng = np.random.default_rng(2)
    h, w = 48, 64
    triples = []
    for i in range(5):
        image = rng.integers(0, 256, size=(h, w, 3), dtype=np.uint8)
        mask = rng.integers(0, 4, size=(h, w)).astype(np.uint8)
        n = int(rng.integers(1, 5))
        rows = [
            f"{rng.integers(1, 4)},{rng.uniform(0, 30):.2f},"
            f"{rng.uniform(0, 20):.2f},{rng.uniform(31, 63):.2f},"
            f"{rng.uniform(21, 47):.2f}"
            for _ in range(n)
        ]
        ip, mp, cp = (
            str(tmp_path / f"i{i}.png"),
            str(tmp_path / f"m{i}.png"),
            str(tmp_path / f"c{i}.csv"),
        )
        Image.fromarray(image).save(ip)
        Image.fromarray(mask, mode="L").save(mp)
        open(cp, "w").write("\r\n".join(rows))
        triples.append((ip, mp, cp))

    loader = native_loader.NativeBatchLoader((h, w), max_ground_truth_boxes=8,
                                             num_workers=4)
    images, masks, labels, boxes, valid = loader.load_batch(triples)
    loader.close()

    for i, triple in enumerate(triples):
        pi, pm, pl, pb, pv = _load_sample(triple, 8)
        np.testing.assert_array_equal(images[i], pi)
        np.testing.assert_array_equal(masks[i], pm)
        np.testing.assert_array_equal(labels[i], pl)
        np.testing.assert_allclose(boxes[i], pb, rtol=1e-6)
        np.testing.assert_array_equal(valid[i], pv)


def test_scratch_reuse_across_mixed_decodes():
    """The round-4 decode path reuses thread-local scratch (IDAT/raw
    buffers, inflater window, PngImage) across calls — alternating sizes,
    color types and palette/non-palette images must not leak state
    (stale palette, oversized buffers, inflater carry-over)."""
    from PIL import Image

    rng = np.random.default_rng(42)
    big_rgb = rng.integers(0, 256, size=(120, 160, 3), dtype=np.uint8)
    small_gray = rng.integers(0, 4, size=(16, 24), dtype=np.uint8)
    # >16 palette entries so PIL writes an 8-bit palette PNG (the decoder
    # supports bit depth 8 only, like the dataset's PNGs)
    pal_arr = rng.integers(0, 20, size=(32, 48), dtype=np.uint8)
    pal_img = Image.fromarray(pal_arr, mode="P")
    pal_img.putpalette(list(range(60)))
    buf = io.BytesIO()
    pal_img.save(buf, format="PNG")
    pal_png = buf.getvalue()

    seq = [
        ("rgb", _png_bytes(big_rgb, "RGB"), big_rgb),
        ("gray", _png_bytes(small_gray, "L"), small_gray),
        ("pal", pal_png, pal_arr),
        ("gray", _png_bytes(small_gray, "L"), small_gray),
        ("rgb", _png_bytes(big_rgb, "RGB"), big_rgb),
    ]
    for _ in range(2):  # second round exercises fully-warm scratch
        for kind, png, want in seq:
            if kind == "rgb":
                got = native_loader.decode_png_rgb(png)
                np.testing.assert_array_equal(got, want)
            else:
                got = native_loader.decode_png_gray(png)
                np.testing.assert_array_equal(got, want)


def test_corrupt_deflate_stream_fails_cleanly():
    """Truncated/garbled IDAT must fail with a decode error, not succeed
    or crash — the raw-inflate rewrite keeps the Z_STREAM_END +
    total_out checks."""
    rng = np.random.default_rng(3)
    arr = rng.integers(0, 256, size=(40, 56, 3), dtype=np.uint8)
    data = bytearray(_png_bytes(arr, "RGB"))
    # garble bytes in the middle of the file (inside IDAT deflate data)
    mid = len(data) // 2
    for i in range(mid, mid + 16):
        data[i] ^= 0xFF
    with pytest.raises(native_loader.NativeLoaderError):
        native_loader.decode_png_rgb(bytes(data))
