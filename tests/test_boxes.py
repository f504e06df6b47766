"""Golden-parity tests for anchor generation vs the reference implementation."""

import numpy as np
import pytest

from ssdseglib_tpu import boxes as tpu_boxes

WAREHOUSE_KWARGS = dict(
    feature_maps_shapes=((30, 40), (15, 20), (8, 10), (4, 5)),
    centers_padding_from_borders_percentage=(0.025, 0.05, 0.075, 0.1),
    boxes_scales=(0.15, 0.95),
    additional_square_box=True,
)

ALT_KWARGS = dict(
    feature_maps_shapes=((7, 9), (3, 3), (1, 1)),
    feature_maps_aspect_ratios=((1, 2, 0.5), (1, 3), (1,)),
    centers_padding_from_borders_percentage=0.1,
    boxes_scales=(0.3, 0.8),
    additional_square_box=False,
)


@pytest.mark.parametrize("kwargs", [WAREHOUSE_KWARGS, ALT_KWARGS])
@pytest.mark.parametrize("image_shape", [(480, 640), (123, 321)])
def test_anchor_parity_with_reference(reference, kwargs, image_shape):
    ref = reference.boxes.DefaultBoundingBoxes(**kwargs)
    ref.rescale_boxes_coordinates(image_shape=image_shape)

    ours = tpu_boxes.DefaultBoundingBoxes(**kwargs)
    ours.rescale_boxes_coordinates(image_shape=image_shape)

    for getter in [
        "get_boxes_coordinates_corners",
        "get_boxes_coordinates_xmin",
        "get_boxes_coordinates_ymin",
        "get_boxes_coordinates_xmax",
        "get_boxes_coordinates_ymax",
        "get_boxes_coordinates_centroids",
        "get_boxes_coordinates_center_x",
        "get_boxes_coordinates_center_y",
        "get_boxes_coordinates_width",
        "get_boxes_coordinates_height",
    ]:
        ref_ssd = getattr(ref, getter)("ssd")
        our_ssd = getattr(ours, getter)("ssd")
        np.testing.assert_allclose(
            our_ssd, ref_ssd, rtol=1e-5, atol=1e-4, err_msg=getter
        )

    # feature-maps style: per-map arrays match too
    ref_fm = ref.get_boxes_coordinates_corners("feature-maps")
    our_fm = ours.get_boxes_coordinates_corners("feature-maps")
    assert len(ref_fm) == len(our_fm)
    for r, o in zip(ref_fm, our_fm):
        np.testing.assert_allclose(o, r, rtol=1e-5, atol=1e-4)


def test_warehouse_total_boxes():
    dbb = tpu_boxes.DefaultBoundingBoxes(**WAREHOUSE_KWARGS)
    dbb.rescale_boxes_coordinates((480, 640))
    corners = dbb.get_boxes_coordinates_corners("ssd")
    assert corners.shape == (9600, 4)  # BASELINE.md published value


def test_rescale_is_idempotent():
    """The reference double-scales on repeat calls (boxes.py:162-177 in-place
    aliasing bug); ours must be idempotent."""
    dbb = tpu_boxes.DefaultBoundingBoxes(**WAREHOUSE_KWARGS)
    dbb.rescale_boxes_coordinates((480, 640))
    first = dbb.get_boxes_coordinates_corners("ssd").copy()
    dbb.rescale_boxes_coordinates((480, 640))
    second = dbb.get_boxes_coordinates_corners("ssd")
    np.testing.assert_array_equal(first, second)


def test_corner_centroid_roundtrip():
    rng = np.random.default_rng(0)
    xmin = rng.uniform(0, 100, 64)
    ymin = rng.uniform(0, 100, 64)
    xmax = xmin + rng.uniform(1, 50, 64)
    ymax = ymin + rng.uniform(1, 50, 64)
    cx, cy, w, h = tpu_boxes.coordinates_corners_to_centroids(xmin, ymin, xmax, ymax)
    x0, y0, x1, y1 = tpu_boxes.coordinates_centroids_to_corners(cx, cy, w, h)
    np.testing.assert_allclose(x0, xmin, rtol=1e-6)
    np.testing.assert_allclose(y1, ymax, rtol=1e-6)
    # +1 pixel convention
    np.testing.assert_allclose(w, xmax - xmin + 1.0)


def test_anchors_bundle(warehouse_anchors):
    a = warehouse_anchors
    assert a.total_boxes == 9600
    np.testing.assert_allclose(
        a.width, a.xmax - a.xmin + 1.0, rtol=1e-6
    )
    np.testing.assert_allclose(a.area, a.width * a.height, rtol=1e-6)
