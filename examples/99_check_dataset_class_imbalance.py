"""Dataset sanity checks — script equivalent of reference notebook
`99-check-dataset-class-imbalance.ipynb`: per-class object counts,
segmentation pixel shares, and box aspect-ratio percentiles (the numbers
that justified the anchor aspect-ratio and loss-weight choices).

Run:  python examples/99_check_dataset_class_imbalance.py            # synthetic
      python examples/99_check_dataset_class_imbalance.py --data data/train.json
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# persistent XLA compile cache: fresh processes reuse compiled
# programs (20-40 s/program on this relay) — utils/compile_cache.py
from ssdseglib_tpu.utils.compile_cache import enable_compile_cache

enable_compile_cache()

import argparse
from collections import Counter

import numpy as np

from ssdseglib_tpu.data.pipeline import _load_sample, load_dataset_json
from ssdseglib_tpu.data.synthetic import generate_dataset


def main() -> None:
    parser = argparse.ArgumentParser()
    parser.add_argument("--data", type=str, default=None)
    parser.add_argument("--samples", type=int, default=128)
    parser.add_argument("--num-classes", type=int, default=4)
    args = parser.parse_args()

    if args.data:
        samples = load_dataset_json(args.data)
    else:
        print("no --data given: using synthetic warehouse scenes")
        samples = generate_dataset(args.samples, image_shape=(480, 640))

    box_counts = Counter()
    pixel_counts = np.zeros(args.num_classes, dtype=np.int64)
    aspect_ratios = {c: [] for c in range(1, args.num_classes)}

    for s in samples:
        _, mask, labels, boxes, valid = _load_sample(s, max_gt=64)
        classes, counts = np.unique(mask, return_counts=True)
        for c, n in zip(classes, counts):
            if c < args.num_classes:
                pixel_counts[c] += int(n)
        for label, box in zip(labels[valid], boxes[valid]):
            box_counts[int(label)] += 1
            w = box[2] - box[0] + 1.0
            h = box[3] - box[1] + 1.0
            if h > 0:
                aspect_ratios[int(label)].append(w / h)

    total_boxes = sum(box_counts.values())
    print(f"\nobject counts ({total_boxes} boxes over {len(samples)} samples):")
    for c in sorted(box_counts):
        print(f"  class {c}: {box_counts[c]} ({box_counts[c] / total_boxes:.1%})")

    total_px = pixel_counts.sum()
    print("\nsegmentation pixel share:")
    for c in range(args.num_classes):
        print(f"  class {c}: {pixel_counts[c] / total_px:.2%}")
    inv = np.where(pixel_counts > 0, 1.0 / np.maximum(pixel_counts, 1), 0.0)
    weights = inv / inv.sum()
    print(f"  suggested inverse-frequency loss weights: "
          f"{np.round(weights, 3).tolist()}")

    print("\nbox aspect ratio (w:h) percentiles per class:")
    for c, ars in aspect_ratios.items():
        if not ars:
            continue
        p = np.percentile(ars, [5, 25, 50, 75, 95])
        print(f"  class {c}: p5={p[0]:.2f} p25={p[1]:.2f} p50={p[2]:.2f} "
              f"p75={p[3]:.2f} p95={p[4]:.2f}")


if __name__ == "__main__":
    main()
