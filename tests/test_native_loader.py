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
