"""Golden test of the reference data-file plumbing (VERDICT r2 missing #3):
read the ACTUAL `/root/reference/data/*.json` metadata, synthesize the
referenced PNG/CSV files for a few entries, and run them through
`load_dataset_json` -> `TrainDataLoader` -> the device encoder.

The reference images are proprietary and absent (reference
data/.gitignore:1-5); the metadata JSONs are real, so path resolution and
file-format expectations are exercised against the genuine artifacts.
"""

import os

import numpy as np
import pytest

from ssdseglib_tpu.boxes import Anchors
from ssdseglib_tpu.config import AnchorsConfig, EncodingConfig
from ssdseglib_tpu.data.pipeline import TrainDataLoader, load_dataset_json

REFERENCE_DATA = "/root/reference/data"

# every metadata file the reference notebooks read (notebook 03 cell 4,
# notebook 99) with its published sample count (SURVEY.md C24)
EXPECTED_COUNTS = {
    "train.json": 1982,
    "train-additional-persons.json": 1156,
    "train-additional-forklifts.json": 269,
    "eval.json": 359,
    "eval-forklifts.json": 137,
    "eval-persons-forklifts.json": 204,
    "test.json": 496,
}


@pytest.mark.parametrize("name,count", sorted(EXPECTED_COUNTS.items()))
def test_load_reference_metadata(name, count):
    """Parse each real metadata JSON; reference-layout paths must resolve
    against the repo root (reference notebook 03 cell 4 cwd convention)."""
    path = os.path.join(REFERENCE_DATA, name)
    triples = load_dataset_json(path)
    assert len(triples) == count
    for image_path, mask_path, csv_path in triples[:5]:
        # resolved against /root/reference (NOT /root/reference/data)
        assert image_path.startswith("/root/reference/data/"), image_path
        assert not image_path.startswith("/root/reference/data/data/"), (
            image_path
        )
        assert image_path.endswith(".png")
        assert mask_path.endswith("_mask.png")
        # the additional-persons/-forklifts splits carry a real typo in the
        # reference metadata: `_labels_boxex.csv` (reference
        # data/train-additional-persons.json) — accepted as-is, the loader
        # treats the CSV path as opaque
        assert csv_path.endswith(("_labels_boxes.csv", "_labels_boxex.csv"))


def test_reference_triples_through_loader(tmp_path):
    """Synthesize the files a few real train.json entries reference and
    feed them through TrainDataLoader -> encoder end to end."""
    from PIL import Image

    from ssdseglib_tpu.data.synthetic import generate_sample

    entries = load_dataset_json(
        os.path.join(REFERENCE_DATA, "train.json"), root=str(tmp_path)
    )[:4]

    image_shape = (96, 128)
    for i, (image_path, mask_path, csv_path) in enumerate(entries):
        os.makedirs(os.path.dirname(image_path), exist_ok=True)
        s = generate_sample(i, image_shape=image_shape, seed=5)
        Image.fromarray(s.image).save(image_path)
        Image.fromarray(s.mask).save(mask_path)
        with open(csv_path, "w") as f:
            for label, (x0, y0, x1, y1) in zip(s.labels, s.boxes):
                # reference CSVs are CRLF-separated (reference
                # datacoder.py:194-196)
                f.write(f"{int(label)},{x0:.0f},{y0:.0f},{x1:.0f},{y1:.0f}\r\n")

    anchors_cfg = AnchorsConfig(
        feature_maps_shapes=((6, 8), (3, 4), (2, 2), (1, 1)),
        feature_maps_aspect_ratios=((1.0, 2.0, 0.5),) * 4,
        boxes_scales=(0.2, 0.9),
        centers_padding_from_borders=(0.05,) * 4,
        additional_square_box=True,
    )
    enc_cfg = EncodingConfig(
        num_classes=4,
        image_shape=image_shape,
        iou_threshold=0.35,
        max_ground_truth_boxes=16,
    )
    anchors = Anchors.from_config(anchors_cfg, image_shape)

    loader = TrainDataLoader(
        entries,
        anchors,
        enc_cfg,
        batch_size=4,
        augmentation_horizontal_flip=False,
        augmentation_rgb=False,
        shuffle=False,
    )
    images, targets = next(iter(loader))
    n = anchors.total_boxes
    assert images.shape == (4,) + image_shape + (3,)
    assert targets["output-mask"].shape == (4,) + image_shape + (4,)
    assert targets["output-labels"].shape == (4, n, 4)
    assert targets["output-boxes"].shape == (4, n, 4)
    # encoded labels are one-hot rows; at least one positive anchor matched
    labels = np.asarray(targets["output-labels"])
    np.testing.assert_allclose(labels.sum(-1), 1.0, rtol=1e-6)
    assert (labels[..., 1:].sum() > 0), "no anchor matched any GT box"


def test_root_heuristic_prefers_existing_json_dir_layout(tmp_path):
    """A dataset whose JSON-dir-relative paths legitimately start with the
    directory's own name (e.g. /ds/train/train.json listing 'train/0.png'
    with files at /ds/train/train/0.png) must NOT be mis-resolved against
    the parent directory: the heuristic only assumes the reference layout
    when the JSON-dir-relative resolution does not exist."""
    import json

    ds = tmp_path / "train"
    inner = ds / "train"
    inner.mkdir(parents=True)
    (inner / "0.png").write_bytes(b"x")
    triples = [["train/0.png", "train/0_mask.png", "train/0.csv"]]
    jpath = ds / "train.json"
    jpath.write_text(json.dumps(triples))

    out = load_dataset_json(str(jpath))
    assert out[0][0] == str(inner / "0.png")

    # and with the file ABSENT at the json-dir resolution, the reference
    # repo-root layout is assumed (paths against the json's parent)
    (inner / "0.png").unlink()
    out = load_dataset_json(str(jpath))
    assert out[0][0] == str(tmp_path / "train" / "0.png")
