"""Subprocess driver: the reference notebook 03 *tf.data* recipe on the
compat package — real PNG/CSV/JSON files on disk, `Dataset.map` over the
bridged `read_and_encode` / `augmentation_rgb_channels` / `read_image`
(reference notebook 03 cells 4/8), Keras-style compile/fit, `model.save`,
`tf.keras.models.load_model` (shim), inference `predict(ds_test)`, and the
evaluators (cells 14-29) — at small shapes on CPU.
"""

import json
import os
import random
import sys
import tempfile

sys.path.insert(0, "/root/repo")

import jax

jax.config.update("jax_platforms", "cpu")

import numpy as np
import tensorflow as tf

import ssdseglib

tf.random.set_seed(1993)
random.seed(1993)

INPUT_IMAGE_SHAPE = (96, 128, 3)
LABELS_CODES = [0, 1, 2, 3]
LABEL_CODE_BACKGROUND = 0
NUMBER_OF_CLASSES = len(LABELS_CODES)
STANDARD_DEVIATIONS_CENTROIDS_OFFSETS = (0.1, 0.1, 0.2, 0.2)
BATCH_SIZE = 4

# --- synthesize a dataset on disk (PNG image, PNG mask, CSV boxes, JSON) ---
root = tempfile.mkdtemp()
os.makedirs(f"{root}/data/images", exist_ok=True)
rng = np.random.default_rng(7)


def write_sample(i):
    from PIL import Image

    h, w = INPUT_IMAGE_SHAPE[:2]
    image = rng.integers(0, 256, (h, w, 3), dtype=np.uint8)
    mask = np.zeros((h, w), dtype=np.uint8)
    label = int(rng.integers(1, 4))
    y0, x0 = int(rng.integers(0, h // 2)), int(rng.integers(0, w // 2))
    y1, x1 = y0 + h // 3, x0 + w // 3
    mask[y0:y1, x0:x1] = label
    image[y0:y1, x0:x1] = (50 + 60 * label) % 255
    pi = f"{root}/data/images/img{i}.png"
    pm = f"{root}/data/images/mask{i}.png"
    pl = f"{root}/data/images/boxes{i}.csv"
    Image.fromarray(image).save(pi)
    Image.fromarray(mask).save(pm)
    with open(pl, "w") as f:
        f.write(f"{label},{x0},{y0},{x1 - 1},{y1 - 1}\r\n")
    return [pi, pm, pl]


train_meta = [write_sample(i) for i in range(8)]
test_meta = [write_sample(100 + i) for i in range(4)]
with open(f"{root}/data/train.json", "w") as f:
    json.dump(train_meta, f)
with open(f"{root}/data/test.json", "w") as f:
    json.dump(test_meta, f)

# --- metadata load (cell 4 pattern) ---
with open(f"{root}/data/train.json") as f:
    data = json.load(f)
path_files_images_train, path_files_masks_train, path_files_labels_boxes_train = map(
    list, zip(*data)
)
with open(f"{root}/data/test.json") as f:
    (
        path_files_images_test,
        path_files_masks_test,
        path_files_labels_boxes_test,
    ) = map(list, zip(*json.load(f)))

# --- default boxes + data coder (cell 6) ---
boxes_default = ssdseglib.boxes.DefaultBoundingBoxes(
    feature_maps_shapes=((6, 8), (3, 4), (2, 2), (1, 1)),
    centers_padding_from_borders_percentage=(0.025, 0.05, 0.075, 0.1),
    boxes_scales=(0.15, 0.95),
    additional_square_box=True,
)
boxes_default.rescale_boxes_coordinates(image_shape=INPUT_IMAGE_SHAPE[:2])

data_reader_encoder = ssdseglib.datacoder.DataEncoderDecoder(
    num_classes=NUMBER_OF_CLASSES,
    image_shape=INPUT_IMAGE_SHAPE[:2],
    xmin_boxes_default=boxes_default.get_boxes_coordinates_xmin(coordinates_style="ssd"),
    ymin_boxes_default=boxes_default.get_boxes_coordinates_ymin(coordinates_style="ssd"),
    xmax_boxes_default=boxes_default.get_boxes_coordinates_xmax(coordinates_style="ssd"),
    ymax_boxes_default=boxes_default.get_boxes_coordinates_ymax(coordinates_style="ssd"),
    iou_threshold=0.525,
    standard_deviations_centroids_offsets=STANDARD_DEVIATIONS_CENTROIDS_OFFSETS,
    augmentation_horizontal_flip=True,
)

# --- tf.data pipelines (cell 8, verbatim recipe) ---
ds_train = (
    tf.data.Dataset.from_tensor_slices(
        (path_files_images_train, path_files_masks_train, path_files_labels_boxes_train)
    )
    .shuffle(buffer_size=len(path_files_images_train))
    .map(data_reader_encoder.read_and_encode, num_parallel_calls=tf.data.AUTOTUNE)
    .batch(batch_size=BATCH_SIZE)
    .map(ssdseglib.datacoder.augmentation_rgb_channels, num_parallel_calls=tf.data.AUTOTUNE)
    .prefetch(buffer_size=tf.data.AUTOTUNE)
)
ds_eval = (
    tf.data.Dataset.from_tensor_slices(
        (path_files_images_test, path_files_masks_test, path_files_labels_boxes_test)
    )
    .map(data_reader_encoder.read_and_encode, num_parallel_calls=tf.data.AUTOTUNE)
    .batch(batch_size=BATCH_SIZE)
    .prefetch(buffer_size=tf.data.AUTOTUNE)
)
ds_test = (
    tf.data.Dataset.from_tensor_slices(path_files_images_test)
    .map(ssdseglib.datacoder.read_image, num_parallel_calls=tf.data.AUTOTUNE)
    .batch(batch_size=BATCH_SIZE)
    .prefetch(buffer_size=tf.data.AUTOTUNE)
)

# --- model + compile (cells 10/12/14) ---
model_builder = ssdseglib.models.MobileNetV2SsdSegBuilder(
    input_image_shape=INPUT_IMAGE_SHAPE,
    number_of_boxes_per_point=[
        len(ars) + (1 if boxes_default.additional_square_box else 0)
        for ars in boxes_default.feature_maps_aspect_ratios
    ],
    number_of_classes=NUMBER_OF_CLASSES,
    center_x_boxes_default=boxes_default.get_boxes_coordinates_center_x(coordinates_style="ssd"),
    center_y_boxes_default=boxes_default.get_boxes_coordinates_center_y(coordinates_style="ssd"),
    width_boxes_default=boxes_default.get_boxes_coordinates_width(coordinates_style="ssd"),
    height_boxes_default=boxes_default.get_boxes_coordinates_height(coordinates_style="ssd"),
    standard_deviations_centroids_offsets=STANDARD_DEVIATIONS_CENTROIDS_OFFSETS,
)
model = model_builder.get_model_for_training(
    segmentation_architecture="deeplabv3plus",
    object_detection_architecture="ssdlite",
    segmentation_dilation_rates=(3, 6, 12),
)
model.compile(
    optimizer=tf.keras.optimizers.Adam(learning_rate=1e-4),
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
            center_x_boxes_default=data_reader_encoder.center_x_boxes_default,
            center_y_boxes_default=data_reader_encoder.center_y_boxes_default,
            width_boxes_default=data_reader_encoder.width_boxes_default,
            height_boxes_default=data_reader_encoder.height_boxes_default,
            standard_deviations_centroids_offsets=STANDARD_DEVIATIONS_CENTROIDS_OFFSETS,
        ),
    },
)

# --- fit / save / load (cells 16/17/19) ---
history = model.fit(ds_train, epochs=2, validation_data=ds_eval, verbose=0)
assert np.isfinite(history.history["loss"]).all(), history.history
assert "val_loss" in history.history

model.save(f"{root}/models/test-model.keras")
model_trained = tf.keras.models.load_model(
    f"{root}/models/test-model.keras", compile=False
)
assert isinstance(model_trained, ssdseglib.models.KerasStyleModel), type(model_trained)

# --- inference + predict over tf.data (cells 23/25) ---
model_inference = model_builder.get_model_for_inference(
    model_trained=model_trained,
    max_number_of_boxes_per_class=4,
    max_number_of_boxes_per_sample=10,
    boxes_iou_threshold=0.025,
    labels_probability_threshold=0.3,
    suppress_background_boxes=False,
    use_segmentation_suppression=True,
)
segmentation_pred_batch, detection_pred_batch = model_inference.predict(ds_test)
assert segmentation_pred_batch.shape == (4,) + INPUT_IMAGE_SHAPE[:2] + (4,)
assert detection_pred_batch.shape == (4, 10, 6)

labels_pred_batch = detection_pred_batch[:, :, 0].astype(np.int32)
confidences_pred_batch = detection_pred_batch[:, :, 1].astype(np.float32)
boxes_pred_batch = detection_pred_batch[:, :, 2:].astype(np.float32)

# --- evaluators (cells 27/29) ---
iou_per_class = ssdseglib.evaluators.jaccard_iou_semantic_segmentation(
    masks_pred_batch=segmentation_pred_batch.astype(np.float32),
    path_files_masks=path_files_masks_test,
    labels_codes=LABELS_CODES,
    label_code_background=LABEL_CODE_BACKGROUND,
)
assert set(iou_per_class) == {1, 2, 3}
average_precision_per_class = ssdseglib.evaluators.average_precision_object_detection(
    labels_pred_batch=labels_pred_batch,
    confidences_pred_batch=confidences_pred_batch,
    boxes_pred_batch=boxes_pred_batch,
    iou_threshold=0.5,
    path_files_labels_boxes=path_files_labels_boxes_test,
    labels_codes=LABELS_CODES,
    label_code_background=LABEL_CODE_BACKGROUND,
)
assert set(average_precision_per_class) == {1, 2, 3}

# --- callable inference (cell 31 pattern) ---
from PIL import Image

image = Image.open(path_files_images_test[0])
image_batch = np.expand_dims(image, axis=0)
output_mask, output_object_detection = model_inference(image_batch, training=False)
if output_object_detection.ndim > 2:
    output_object_detection = tf.squeeze(output_object_detection, axis=0)
assert np.asarray(output_object_detection).shape == (10, 6)

print("TF_PIPELINE_FLOW_OK")
