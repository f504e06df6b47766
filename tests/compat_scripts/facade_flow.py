"""Subprocess driver: the reference notebook 03 API flow on the compat
package (cells 6/10/12/14/16/17/19/23/25 surface), small shapes, CPU.

Run by tests/test_ssdseglib_compat.py in a subprocess so the `ssdseglib`
compat package never collides with the reference oracle package other
tests import in-process (tests/conftest.py `reference` fixture).
"""

import sys

sys.path.insert(0, "/root/repo")

import jax

jax.config.update("jax_platforms", "cpu")

import numpy as np

import ssdseglib

INPUT_IMAGE_SHAPE = (96, 128, 3)
STDS = (0.1, 0.1, 0.2, 0.2)

boxes_default = ssdseglib.boxes.DefaultBoundingBoxes(
    feature_maps_shapes=((6, 8), (3, 4), (2, 2), (1, 1)),
    centers_padding_from_borders_percentage=(0.025, 0.05, 0.075, 0.1),
    boxes_scales=(0.2, 0.9),
    additional_square_box=True,
)
boxes_default.rescale_boxes_coordinates(image_shape=INPUT_IMAGE_SHAPE[:2])

anchor_kwargs = dict(
    center_x_boxes_default=boxes_default.get_boxes_coordinates_center_x(
        coordinates_style="ssd"
    ),
    center_y_boxes_default=boxes_default.get_boxes_coordinates_center_y(
        coordinates_style="ssd"
    ),
    width_boxes_default=boxes_default.get_boxes_coordinates_width(
        coordinates_style="ssd"
    ),
    height_boxes_default=boxes_default.get_boxes_coordinates_height(
        coordinates_style="ssd"
    ),
    standard_deviations_centroids_offsets=STDS,
)

model_builder = ssdseglib.models.MobileNetV2SsdSegBuilder(
    input_image_shape=INPUT_IMAGE_SHAPE,
    number_of_boxes_per_point=[
        len(ars) + 1 for ars in boxes_default.feature_maps_aspect_ratios
    ],
    number_of_classes=4,
    **anchor_kwargs,
)
model = model_builder.get_model_for_training(
    segmentation_architecture="deeplabv3plus",
    object_detection_architecture="ssdlite",
    segmentation_dilation_rates=(3, 6, 12),
)
model.summary()

model.compile(
    optimizer=1e-4,
    loss={
        "output-mask": ssdseglib.losses.cross_entropy(
            classes_weights=(0.05, 0.575, 0.135, 0.24)
        ),
        "output-labels": ssdseglib.losses.confidence_loss,
        "output-boxes": ssdseglib.losses.localization_loss,
    },
    loss_weights={"output-mask": 1.0, "output-labels": 1.0, "output-boxes": 1.0},
    metrics={
        "output-mask": ssdseglib.metrics.jaccard_iou_segmentation_masks(
            classes_weights=(0.05, 0.575, 0.135, 0.24)
        ),
        "output-labels": ssdseglib.metrics.categorical_accuracy(
            classes_weights=(0.0, 1 / 3, 1 / 3, 1 / 3)
        ),
        "output-boxes": ssdseglib.metrics.jaccard_iou_bounding_boxes(
            **anchor_kwargs
        ),
    },
)

n_anchors = anchor_kwargs["center_x_boxes_default"].shape[0]
rng = np.random.default_rng(0)


def make_batch():
    images = rng.uniform(0, 255, (2,) + INPUT_IMAGE_SHAPE).astype(np.float32)
    mask = np.eye(4, dtype=np.float32)[rng.integers(0, 4, (2,) + INPUT_IMAGE_SHAPE[:2])]
    labels = np.eye(4, dtype=np.float32)[rng.integers(0, 4, (2, n_anchors))]
    boxes = rng.normal(0, 0.1, (2, n_anchors, 4)).astype(np.float32)
    return images, {
        "output-mask": mask,
        "output-labels": labels,
        "output-boxes": boxes,
    }


data = [make_batch() for _ in range(2)]
history = model.fit(data, epochs=3, validation_data=data, verbose=0)

assert len(history.history["loss"]) == 3, history.history
assert np.isfinite(history.history["loss"]).all()
# training should reduce the loss on this fixed data
assert history.history["loss"][-1] < history.history["loss"][0]
for key in (
    "output-mask_loss",
    "output-labels_loss",
    "output-boxes_loss",
    "output-mask_metric",
    "val_loss",
):
    assert key in history.history, key

import tempfile

path = tempfile.mkdtemp() + "/models/test-model.keras"
model.save(path)
loaded = ssdseglib.models.load_model(path, compile=False)

model_inference = model_builder.get_model_for_inference(
    model_trained=loaded,
    max_number_of_boxes_per_class=4,
    max_number_of_boxes_per_sample=10,
    boxes_iou_threshold=0.025,
    labels_probability_threshold=0.5,
    suppress_background_boxes=False,
    use_segmentation_suppression=True,
)
mask, det = model_inference.predict(data[0][0])
assert mask.shape == (2,) + INPUT_IMAGE_SHAPE[:2] + (4,)
assert det.shape == (2, 10, 6)

mask1, det1 = model_inference(data[0][0][:1], training=False)
assert mask1.shape[0] == 1 and det1.shape == (1, 10, 6)

# with suppress_background_boxes=True the direct call matches the
# reference NMS layer: background rows removed INSIDE the call, batch
# structure flattened (reference layers.py:165-166) — same as predict()
model_inference_sup = model_builder.get_model_for_inference(
    model_trained=loaded,
    max_number_of_boxes_per_class=4,
    max_number_of_boxes_per_sample=10,
    boxes_iou_threshold=0.025,
    labels_probability_threshold=0.5,
    suppress_background_boxes=True,
    use_segmentation_suppression=True,
)
_, det_sup = model_inference_sup(data[0][0][:1], training=False)
assert det_sup.ndim == 2 and det_sup.shape[1] == 6
assert (det_sup[:, 0] > 0.0).all()
_, det_sup_p = model_inference_sup.predict(data[0][0][:1])
np.testing.assert_array_equal(det_sup, det_sup_p)

# summary() reports the quirk-preserving head shapes — labels get 4
# channels and boxes get number_of_classes (reference models.py:250-268;
# only visible when num_classes != 4)
builder6 = ssdseglib.models.MobileNetV2SsdSegBuilder(
    input_image_shape=INPUT_IMAGE_SHAPE,
    number_of_boxes_per_point=[
        len(ars) + 1 for ars in boxes_default.feature_maps_aspect_ratios
    ],
    number_of_classes=6,
    **anchor_kwargs,
)
model6 = builder6.get_model_for_training(segmentation_dilation_rates=(3, 6, 12))
lines = []
model6.summary(print_fn=lines.append)
out_line = next(line for line in lines if "output-labels" in line)
import re

m = re.search(r"output-labels \(None, (\d+), (\d+)\), "
              r"output-boxes \(None, (\d+), (\d+)\)", out_line)
assert m, out_line
assert m.group(2) == "4" and m.group(4) == "6", out_line

# loaded model reproduces the saved model exactly
for a, b in zip(model(data[0][0][:1]), loaded(data[0][0][:1])):
    np.testing.assert_allclose(a, b, rtol=1e-5, atol=1e-5)

print("FACADE_FLOW_OK")
