"""SSD framework walkthrough — script equivalent of reference notebook
`01-ssd-framework-single-shot-detector-for-object-detection.ipynb`.

Demonstrates the detection data path end to end on synthetic data:
anchor generation, ground-truth encoding, decoding back, and the
invariants that make SSD training work.

Run:  python examples/01_ssd_framework.py
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# persistent XLA compile cache: fresh processes reuse compiled
# programs (20-40 s/program on this relay) — utils/compile_cache.py
from ssdseglib_tpu.utils.compile_cache import enable_compile_cache

enable_compile_cache()

import numpy as np

from ssdseglib_tpu.boxes import DefaultBoundingBoxes
from ssdseglib_tpu.datacoder import DataEncoderDecoder
from ssdseglib_tpu.data.synthetic import generate_sample


def main() -> None:
    image_shape = (480, 640)

    # 1. default bounding boxes ("anchors"), published warehouse config
    #    (reference notebook 03 cell 6)
    boxes_default = DefaultBoundingBoxes(
        feature_maps_shapes=((30, 40), (15, 20), (8, 10), (4, 5)),
        centers_padding_from_borders_percentage=(0.025, 0.05, 0.075, 0.1),
        boxes_scales=(0.15, 0.95),
        additional_square_box=True,
    )
    boxes_default.rescale_boxes_coordinates(image_shape=image_shape)
    corners = boxes_default.get_boxes_coordinates_corners("ssd")
    print(f"total default boxes: {corners.shape[0]}")  # 9600
    per_map = boxes_default.get_boxes_coordinates_corners("feature-maps")
    for i, m in enumerate(per_map):
        print(f"  feature map {i}: grid {m.shape[:2]}, {m.shape[2]} boxes/point")

    # 2. encoder/decoder
    coder = DataEncoderDecoder(
        num_classes=4,
        image_shape=image_shape,
        xmin_boxes_default=boxes_default.get_boxes_coordinates_xmin("ssd"),
        ymin_boxes_default=boxes_default.get_boxes_coordinates_ymin("ssd"),
        xmax_boxes_default=boxes_default.get_boxes_coordinates_xmax("ssd"),
        ymax_boxes_default=boxes_default.get_boxes_coordinates_ymax("ssd"),
        iou_threshold=0.525,
        standard_deviations_centroids_offsets=(0.1, 0.1, 0.2, 0.2),
    )

    # 3. synthetic scene -> encode -> decode round trip
    sample = generate_sample(0, image_shape=image_shape)
    print(f"\nsynthetic scene: {len(sample.labels)} objects, "
          f"labels {sample.labels.tolist()}")
    enc_labels, enc_offsets = coder.encode_ground_truth(
        sample.labels, sample.boxes
    )
    positives = int((enc_labels[:, 0] == 0).sum())
    print(f"anchors matched (positives): {positives} / {enc_labels.shape[0]}")

    decoded = np.asarray(coder.decode_to_corners(enc_offsets))
    matched = enc_labels[:, 0] == 0
    worst = 0.0
    for corners_decoded in decoded[matched]:
        err = np.min(np.max(np.abs(sample.boxes - corners_decoded), axis=1))
        worst = max(worst, float(err))
    print(f"decode round-trip worst corner error: {worst:.5f} px")

    # 4. flips preserve encode/decode consistency
    enc_labels_f, enc_offsets_f = coder.encode_ground_truth(
        sample.labels, sample.boxes, flip_horizontal=True
    )
    print(f"positives after horizontal flip: {int((enc_labels_f[:, 0] == 0).sum())}")


if __name__ == "__main__":
    main()
