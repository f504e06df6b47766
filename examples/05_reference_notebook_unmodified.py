"""Execute the REFERENCE notebooks' code cells VERBATIM against the
JAX/TPU backend through the `ssdseglib` compat package.

This is the BASELINE.json north-star check ("the tutorial notebooks run
unmodified against the new backend"): the code cells of the reference
notebooks (01 SSD framework, 03 training, 99 class imbalance — 02 is
absent from the mount, reference .MISSING_LARGE_BLOBS:1) are extracted
and exec'd unmodified, in order, in one namespace.  The only things this
runner controls are *outside* the cells:

- the working directory: the reference images are proprietary and absent
  (reference data/.gitignore:1-5), so `data/*.json` point at synthetic
  480x640 scenes (ssdseglib_tpu.data.synthetic) written before cell 1 runs
- optionally `SSDSEGLIB_MAX_EPOCHS` (a documented compat-facade knob) to
  bound notebook 03's 105-epoch fit cell for quick smoke runs; by default
  the fit runs the full verbatim 105 epochs
- MPLBACKEND=Agg so the plotting cells run headless

Usage:
    python examples/05_reference_notebook_unmodified.py \
        [--notebook {01,03,99,all}] [--max-epochs N] [--workdir DIR] [--cpu]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
NOTEBOOKS = {
    "01": "/root/reference/01-ssd-framework-single-shot-detector-for-object-detection.ipynb",
    "03": "/root/reference/03-multi-task-network-ssdlite-deeplabv3plus-training.ipynb",
    "99": "/root/reference/99-check-dataset-class-imbalance.ipynb",
}


def synthesize_data(workdir: str, train_samples: int = 8,
                    test_samples: int = 8) -> None:
    """Write synthetic PNG/CSV triples + the five metadata JSONs the
    notebook's cell 4 reads (reference notebook 03 cell 4)."""
    from PIL import Image

    from ssdseglib_tpu.data.synthetic import generate_sample

    os.makedirs(f"{workdir}/data/images", exist_ok=True)

    # generator fingerprint: a persistent --workdir synthesized by an older
    # generate_sample (or different seed/scene options) must be regenerated,
    # not silently reused (ADVICE r4) — hash the generator's source
    import hashlib
    import inspect

    from ssdseglib_tpu.data import synthetic as _synthetic

    generator_version = hashlib.blake2b(
        inspect.getsource(_synthetic).encode(), digest_size=8
    ).hexdigest()

    def write_split(name: str, count: int, seed: int):
        # idempotent: reuse a previously synthesized split only when the
        # manifest matches (count, seed, scene options, generator version)
        # and EVERY triple's files exist (the 480x640 PNG encodes cost
        # ~1 s/sample on this 1-core host)
        path_json = f"{workdir}/data/{name}.json"
        path_manifest = f"{workdir}/data/{name}.manifest.json"
        manifest = {
            "count": count,
            "seed": seed,
            "non_overlapping": True,
            "generator_version": generator_version,
        }
        if os.path.exists(path_json) and os.path.exists(path_manifest):
            with open(path_json) as f:
                existing = json.load(f)
            with open(path_manifest) as f:
                existing_manifest = json.load(f)
            if existing_manifest == manifest and all(
                os.path.exists(f"{workdir}/{p}") for t in existing for p in t
            ):
                return
        triples = []
        for i in range(count):
            # non_overlapping: exact ground truth (the default overlapping
            # scenes keep full-extent boxes for occluded objects — a GT-noise
            # mAP ceiling of ~0.14 measured in the round-2 learning study).
            # Data synthesis is runner-controlled, outside the verbatim cells.
            s = generate_sample(i, image_shape=(480, 640), seed=seed,
                                non_overlapping=True)
            pi = f"data/images/{name}-{i}-image.png"
            pm = f"data/images/{name}-{i}-mask.png"
            pl = f"data/images/{name}-{i}-boxes.csv"
            Image.fromarray(s.image).save(f"{workdir}/{pi}")
            Image.fromarray(s.mask).save(f"{workdir}/{pm}")
            with open(f"{workdir}/{pl}", "w") as f:
                for label, (x0, y0, x1, y1) in zip(s.labels, s.boxes):
                    f.write(f"{int(label)},{x0:.0f},{y0:.0f},{x1:.0f},{y1:.0f}\r\n")
            triples.append([pi, pm, pl])
        with open(f"{workdir}/data/{name}.json", "w") as f:
            json.dump(triples, f)
        with open(path_manifest, "w") as f:
            json.dump(manifest, f)

    write_split("train", max(2, train_samples // 2), seed=11)
    write_split("train-additional-persons", max(1, train_samples // 4), seed=22)
    write_split("train-additional-forklifts", max(1, train_samples // 4), seed=33)
    write_split("eval-persons-forklifts", max(1, test_samples // 4), seed=44)
    write_split("test", test_samples, seed=55)


def run_notebook(nb: str, namespace: dict) -> dict:
    """exec every code cell of reference notebook `nb` in order; returns
    the resulting namespace for sanity assertions."""
    path = NOTEBOOKS[nb]
    cells = [
        "".join(c["source"])
        for c in json.load(open(path))["cells"]
        if c["cell_type"] == "code"
    ]
    print(f"[runner] {len(cells)} code cells from {path}")
    for i, src in enumerate(cells):
        t0 = time.perf_counter()
        print(f"\n[runner] ===== nb{nb} code cell {i} =====")
        exec(compile(src, f"<notebook{nb}-cell{i}>", "exec"), namespace)
        print(f"[runner] cell {i} done in {time.perf_counter() - t0:.1f}s")
    return namespace


def main() -> None:
    parser = argparse.ArgumentParser()
    parser.add_argument("--notebook", choices=[*NOTEBOOKS, "all"], default="03",
                        help="which reference notebook to execute verbatim")
    parser.add_argument("--max-epochs", type=int, default=None,
                        help="cap the fit cell via SSDSEGLIB_MAX_EPOCHS "
                        "(default: run the verbatim 105 epochs)")
    parser.add_argument("--workdir", default=None)
    parser.add_argument("--cpu", action="store_true",
                        help="force the CPU backend (CI smoke)")
    parser.add_argument("--train-samples", type=int, default=256,
                        help="synthetic training images across the three "
                        "train splits (default 256: enough for the "
                        "VERBATIM_NOTEBOOK_OK learning gate; CI smoke "
                        "passes 14 explicitly)")
    parser.add_argument("--test-samples", type=int, default=64,
                        help="synthetic test images (eval + metrics split)")
    args = parser.parse_args()

    os.environ.setdefault("MPLBACKEND", "Agg")
    if args.max_epochs is not None:
        os.environ["SSDSEGLIB_MAX_EPOCHS"] = str(args.max_epochs)
    if args.cpu:
        import jax

        jax.config.update("jax_platforms", "cpu")

    # The image ships TF 2.21 / Keras 3; the reference pins TF 2.13, whose
    # `tf.keras.saving` alias cell 2 uses.  Restore the alias (exactly what
    # tests/conftest.py does before importing the reference as oracle).
    import tensorflow as tf

    if not hasattr(tf.keras, "saving"):
        import keras

        tf.keras.saving = keras.saving

    workdir = args.workdir or f"/tmp/nb_verbatim_{os.getpid()}"
    os.makedirs(workdir, exist_ok=True)
    if REPO not in sys.path:
        sys.path.insert(0, REPO)
    # persistent XLA compile cache (notebook 03 compiles several programs
    # at 20-40 s each on this relay) — utils/compile_cache.py
    from ssdseglib_tpu.utils.compile_cache import enable_compile_cache

    enable_compile_cache()
    synthesize_data(workdir, train_samples=args.train_samples,
                    test_samples=args.test_samples)
    os.chdir(workdir)
    print(f"[runner] workdir {workdir}")

    todo = list(NOTEBOOKS) if args.notebook == "all" else [args.notebook]
    t_total = time.perf_counter()
    for nb in todo:
        ns = run_notebook(nb, {"__name__": "__main__"})
        # sanity over the namespace the verbatim cells produced
        if nb == "01":
            # cell 2/3 iterate the per-feature-map getters; 4 grids plotted
            dbb = ns["default_bounding_boxes"]
            assert len(dbb.feature_maps_shapes) == 4
            assert len(ns["path_files_images_train"]) > 0
            print(f"\n[runner] VERBATIM_NOTEBOOK_01_OK "
                  f"samples={len(ns['path_files_images_train'])} "
                  f"grids={len(dbb.feature_maps_shapes)}")
        elif nb == "03":
            history = ns["history"]
            losses = history.history["loss"]
            assert len(losses) > 0
            iou_per_class = ns["iou_per_class"]
            miou = sum(iou_per_class.values()) / len(iou_per_class)
            # cell 14 loops IoU 0.5/0.6/0.7, so the namespace variable holds
            # the LAST (0.7) table; the learning assertion is mAP@0.5
            # (VERDICT r3 item 2) — recompute it from the cells' own
            # prediction arrays with the cells' own evaluator.
            import ssdseglib

            ap = ssdseglib.evaluators.average_precision_object_detection(
                labels_pred_batch=ns["labels_pred_batch"],
                confidences_pred_batch=ns["confidences_pred_batch"],
                boxes_pred_batch=ns["boxes_pred_batch"],
                iou_threshold=0.5,
                path_files_labels_boxes=ns["path_files_labels_boxes_test"],
                labels_codes=ns["LABELS_CODES"],
                label_code_background=ns["LABEL_CODE_BACKGROUND"],
            )
            map50 = sum(ap.values()) / len(ap)
            stats = (
                f"epochs={len(losses)} "
                f"first_loss={losses[0]:.4f} final_loss={losses[-1]:.4f} "
                f"mIoU={miou:.4f} mAP={map50:.4f}"
            )
            # VERBATIM_NOTEBOOK_OK asserts LEARNING through the verbatim
            # compat compile/fit/predict/evaluate path (VERDICT r3 item 2):
            # loss must fall and the cells' own mAP (reference nb 03 cell
            # 29) must be nonzero.  Short smoke runs (--max-epochs) that
            # execute every cell but cannot learn yet report
            # VERBATIM_NOTEBOOK_RAN instead.
            learned = len(losses) >= 2 and losses[-1] < losses[0] and map50 > 0
            if learned:
                print(f"\n[runner] VERBATIM_NOTEBOOK_OK {stats}")
            else:
                print(f"\n[runner] VERBATIM_NOTEBOOK_RAN (learning not "
                      f"asserted: needs more epochs/samples) {stats}")
        elif nb == "99":
            assert sum(ns["instances_per_class"].values()) > 0
            print(f"\n[runner] VERBATIM_NOTEBOOK_99_OK "
                  f"instances={dict(ns['instances_per_class'])}")
    print(f"[runner] total={time.perf_counter() - t_total:.0f}s")


if __name__ == "__main__":
    main()
