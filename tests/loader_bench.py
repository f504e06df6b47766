"""Input-pipeline decode benchmark (CPU-only; no TPU needed).

Writes synthetic 480x640 samples to disk, then measures samples/s
(1 sample = image PNG + mask PNG + CSV -> fixed-shape batch slices)
through:
  - the python/PIL path (ssdseglib_tpu.datacoder readers)
  - the native C++ batch loader (native/dataloader.cpp) at several
    worker counts (this container has ONE core; the scaling column is
    meaningful on a real TPU-VM host)

Run: python tests/loader_bench.py [--samples 64] [--reps 3]
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def write_dataset(workdir, n):
    from PIL import Image

    from ssdseglib_tpu.data.synthetic import generate_sample

    os.makedirs(workdir, exist_ok=True)
    triples = []
    for i in range(n):
        s = generate_sample(i, image_shape=(480, 640), seed=7)
        pi = f"{workdir}/{i}-image.png"
        pm = f"{workdir}/{i}-mask.png"
        pl = f"{workdir}/{i}-boxes.csv"
        Image.fromarray(s.image).save(pi)
        Image.fromarray(s.mask).save(pm)
        with open(pl, "w") as f:
            for label, (x0, y0, x1, y1) in zip(s.labels, s.boxes):
                f.write(f"{int(label)},{x0:.0f},{y0:.0f},{x1:.0f},{y1:.0f}\r\n")
        triples.append((pi, pm, pl))
    return triples


def bench_pil(triples, reps):
    from PIL import Image

    from ssdseglib_tpu.datacoder import read_labels_boxes_csv

    best = 0.0
    for _ in range(reps):
        t0 = time.perf_counter()
        for pi, pm, pl in triples:
            np.asarray(Image.open(pi).convert("RGB"))
            np.asarray(Image.open(pm))
            read_labels_boxes_csv(pl)
        rate = len(triples) / (time.perf_counter() - t0)
        best = max(best, rate)
    return best


def bench_native(triples, reps, workers):
    from ssdseglib_tpu.data.native_loader import NativeBatchLoader

    loader = NativeBatchLoader(
        image_shape=(480, 640), max_ground_truth_boxes=32,
        num_workers=workers,
    )
    best = 0.0
    for _ in range(reps):
        t0 = time.perf_counter()
        loader.load_batch(triples)
        rate = len(triples) / (time.perf_counter() - t0)
        best = max(best, rate)
    loader.close()
    return best


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--samples", type=int, default=64)
    parser.add_argument("--reps", type=int, default=3)
    parser.add_argument("--workdir", default="/tmp/loader_bench_data")
    args = parser.parse_args()

    triples = write_dataset(args.workdir, args.samples)
    # warm the page cache so both paths measure decode, not disk
    for paths in triples:
        for p in paths:
            open(p, "rb").read()

    pil = bench_pil(triples, args.reps)
    print(f"python/PIL path:        {pil:7.1f} samples/s")
    for workers in (1, 2, 4):
        native = bench_native(triples, args.reps, workers)
        print(f"native loader, {workers} worker{'s' if workers > 1 else ' '}: "
              f"{native:7.1f} samples/s ({native / pil:.2f}x PIL)")


if __name__ == "__main__":
    main()
