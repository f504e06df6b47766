"""Self-contained AOT serving bundles via `jax.export` (StableHLO).

The reference framework deploys by pickling a Keras model
(`model.save(...)` / `load_model(...)`, reference notebook 03 cells 19/25),
which ships *code*: loading requires the full framework and re-traces /
re-compiles the graph on every process start.  The TPU-native equivalent
of a deployment artifact is the *compiled program itself*: this module
serializes an `InferenceModel`'s jitted end-to-end serving function
(forward -> decode -> gate -> NMS) to versioned StableHLO with
`jax.export`, together with every non-image operand (weights, anchor
constants, NMS thresholds), into one directory that can be reloaded and
served WITHOUT the model-building code, with zero retracing.

Layout of a bundle directory:

    program.stablehlo   jax.export serialization of the serving program
                        (single-batch bundles; multi-batch bundles write
                        one program_b{N}.stablehlo per baked batch size,
                        all sharing the one operand set below)
    operands.npz        every non-image leaf of the program's argument
                        pytree, keyed by operand family + flatten position
    metadata.json       image shape/dtype, leaf slots, platforms,
                        mask_output, jax version
    compiled_auto.pkl   (optional) the AUTO-input-layout compiled
                        executable (jax.experimental.serialize_executable)
                        when the exporting model was built with
                        input_layout='auto' — loaded opportunistically on
                        matching hardware for the full live-model
                        throughput (1422 vs 1363 img/s through the
                        StableHLO program, docs/PERFORMANCE.md round 3),
                        with silent fallback elsewhere

The NMS thresholds stay *runtime arguments* of the exported program (the
same design that lets `set_nms_operating_point` retune a live
`InferenceModel` without recompiling — reference notebook 03 cell 21 grid
searches rebuild the whole Keras graph per point), so a loaded bundle can
be retuned too.
"""

from __future__ import annotations

import json
import os
from typing import Optional, Sequence

import numpy as np

_PROGRAM_FILE = "program.stablehlo"
_OPERANDS_FILE = "operands.npz"
_METADATA_FILE = "metadata.json"
_COMPILED_AUTO_FILE = "compiled_auto.pkl"


class _Slot:
    """Unique placeholder leaf marking a runtime argument position."""

    def __init__(self, name: str) -> None:
        self.name = name


def save_serving_bundle(
    infer,
    path: str,
    *,
    batch,
    image_dtype: str = "uint8",
    platforms: Optional[Sequence[str]] = None,
    include_compiled: bool = True,
) -> None:
    """Export `infer`'s serving program(s) into `path`.

    infer: an `InferenceModel` (models/builder.py).  Each exported program
        is the one `infer(images)` would run at that batch size — the
        fused-backbone program when enabled and the batch is within its
        validated ceiling, else the plain-XLA program.  With
        `input_layout='auto'` the default-layout program is exported (the
        AUTO executable is an AOT artifact of *this* process's runtime and
        not portable).
    batch: batch size(s) to bake.  XLA programs are static-shape; an int
        bakes one program, a sequence (e.g. ``(1, 16)``) bakes one program
        per size SHARING one stored weight set, and
        `ServingBundle.predict_batched` routes each request to the
        largest-fit program — so a deployed b1+b16 bundle serves a single
        image (the reference's interactive use, reference notebook 03 cell
        31) at b1 compute/latency instead of 16x repeat-padded.
    image_dtype: dtype of the image input the bundle will accept.  uint8
        is what the PNG decode path produces; the program casts + rescales
        on device.
    platforms: optional lowering platforms (e.g. ("tpu",) or
        ("cpu", "tpu")); defaults to the current backend.
    include_compiled: when the model was built with input_layout='auto'
        for one of the baked batches, additionally ship its compiled
        AUTO-layout executable (serialize_executable) — hardware-specific,
        loaded opportunistically with fallback to the portable StableHLO
        program.
    """
    import jax
    from jax import export as jax_export

    if getattr(infer, "mesh", None) is not None:
        raise ValueError(
            "save_serving_bundle exports a single-device program; "
            "build the InferenceModel without mesh="
        )

    batches = [batch] if isinstance(batch, (int, np.integer)) else list(batch)
    batches = sorted(set(int(b) for b in batches))
    if not batches or batches[0] < 1:
        raise ValueError(f"batch sizes must be positive ints, got {batch!r}")

    h, w, c = infer.module.cfg.input_image_shape

    # Programs fall into two operand FAMILIES with different argument
    # trees: 'fused' programs bake the BN-folded weights into the traced
    # graph as constants and take an empty variables pytree (so the bundle
    # doesn't carry, and the loader doesn't device-pin, a dead copy of
    # every weight); 'plain' programs read the full variables tree.  A
    # bundle mixing both (e.g. b16 fused + b32 beyond the fused ceiling)
    # stores each family's operand set once — weights are stored at most
    # once either way.
    def family_of(b: int) -> str:
        fused_ok = infer._fused_batch_ok(np.zeros((b, 0, 0, 0), np.uint8))
        return "fused" if (infer._fused_forward is not None and fused_ok) else "plain"

    images_slot = _Slot("images")
    iou_slot = _Slot("iou_threshold")
    score_slot = _Slot("score_threshold")

    def flatten_family(family: str):
        variables_arg = {} if family == "fused" else infer.variables
        args = (
            variables_arg,
            infer._anchors_centroids,
            images_slot,
            iou_slot,
            score_slot,
        )
        leaves, treedef = jax.tree_util.tree_flatten(args)
        slots, ops, dtypes = {}, {}, {}
        for i, leaf in enumerate(leaves):
            if isinstance(leaf, _Slot):
                slots[leaf.name] = i
            else:
                arr = np.asarray(leaf)
                key = f"{family}_op_{i:05d}"
                ops[key] = arr
                # np.load returns extension dtypes (bfloat16, ...) as raw
                # void bytes; record the dtype so the loader can view-cast
                dtypes[key] = str(arr.dtype)
        return leaves, treedef, slots, ops, dtypes

    families = {}
    operands = {}
    operand_dtypes = {}
    programs_meta = {}
    os.makedirs(path, exist_ok=True)

    export_kwargs = {}
    if platforms is not None:
        export_kwargs["platforms"] = tuple(platforms)

    exported_platforms = None
    for b in batches:
        family = family_of(b)
        if family not in families:
            leaves, treedef, slots, ops, dtypes = flatten_family(family)
            families[family] = {
                "leaves": leaves,
                "treedef": treedef,
                "slots": slots,
                "num_leaves": len(leaves),
            }
            operands.update(ops)
            operand_dtypes.update(dtypes)
        fam = families[family]

        # abstract avals for the export trace: real shapes/dtypes for the
        # stored operands, the requested image spec for the runtime slot
        def aval(leaf, b=b):
            if isinstance(leaf, _Slot):
                if leaf.name == "images":
                    return jax.ShapeDtypeStruct(
                        (b, h, w, c), np.dtype(image_dtype)
                    )
                return jax.ShapeDtypeStruct((), np.float32)
            return jax.ShapeDtypeStruct(np.shape(leaf), np.asarray(leaf).dtype)

        aval_args = jax.tree_util.tree_unflatten(
            fam["treedef"], [aval(leaf) for leaf in fam["leaves"]]
        )
        program = (
            infer._forward_program
            if family == "fused" or infer._fallback_programs is None
            else infer._fallback_programs[0]
        )
        exported = jax_export.export(program, **export_kwargs)(*aval_args)
        exported_platforms = list(exported.platforms)
        filename = (
            _PROGRAM_FILE if len(batches) == 1 else f"program_b{b}.stablehlo"
        )
        with open(os.path.join(path, filename), "wb") as f:
            f.write(exported.serialize())
        programs_meta[str(b)] = {"file": filename, "family": family}

    np.savez(os.path.join(path, _OPERANDS_FILE), **operands)
    primary = batches[-1]
    meta = {
        "format_version": 2,
        # primary (largest) batch kept under the v1 keys for readability
        "batch": primary,
        "batches": batches,
        "image_shape": [primary, h, w, c],
        "image_dtype": str(np.dtype(image_dtype)),
        "programs": programs_meta,
        "families": {
            name: {"slots": fam["slots"], "num_leaves": fam["num_leaves"]}
            for name, fam in families.items()
        },
        "operand_dtypes": operand_dtypes,
        "platforms": exported_platforms,
        "mask_output": infer._mask_output,
        "suppress_background_boxes": bool(infer._suppress_background),
        "default_iou_threshold": float(np.asarray(infer._iou_threshold)),
        "default_score_threshold": float(
            np.asarray(infer._score_threshold)
        ),
        "jax_version": jax.__version__,
    }

    auto = getattr(infer, "_auto", None)
    if (
        include_compiled
        and auto is not None
        and auto["batch"] in batches
        and np.dtype(image_dtype) == np.uint8
    ):
        import pickle
        import zlib

        from jax.experimental import serialize_executable as se

        payload, in_tree, out_tree = se.serialize(auto["program"])
        with open(os.path.join(path, _COMPILED_AUTO_FILE), "wb") as f:
            pickle.dump(
                {
                    "payload_zlib": zlib.compress(payload, level=6),
                    "in_tree": in_tree,
                    "out_tree": out_tree,
                },
                f,
            )
        meta["compiled_auto"] = {
            "device_kind": jax.devices()[0].device_kind,
            "platform": jax.devices()[0].platform,
            "jax_version": jax.__version__,
            "batch": int(auto["batch"]),
            "family": family_of(int(auto["batch"])),
        }

    with open(os.path.join(path, _METADATA_FILE), "w") as f:
        json.dump(meta, f, indent=1)


class ServingBundle:
    """A reloaded serving program: `bundle(images) -> (mask, detections)`.

    Self-contained — needs jax and the bundle directory only, no model
    code.  Thresholds are runtime-retunable via
    `set_nms_operating_point`, mirroring the live `InferenceModel`.
    """

    def __init__(self, path: str) -> None:
        import jax
        from jax import export as jax_export

        with open(os.path.join(path, _METADATA_FILE)) as f:
            self.metadata = json.load(f)
        meta = self.metadata
        # normalize the v1 single-program layout into the v2 shape
        if meta.get("format_version", 1) < 2:
            meta["batches"] = [int(meta["batch"])]
            meta["programs"] = {
                str(meta["batch"]): {"file": _PROGRAM_FILE, "family": "main"}
            }
            meta["families"] = {
                "main": {
                    "slots": meta["slots"],
                    "num_leaves": meta["num_leaves"],
                }
            }
            if "compiled_auto" in meta:
                meta["compiled_auto"].setdefault("batch", int(meta["batch"]))
                meta["compiled_auto"].setdefault("family", "main")

        data = np.load(os.path.join(path, _OPERANDS_FILE))
        dtypes = meta["operand_dtypes"]
        # operands pinned on device once, like InferenceModel.variables;
        # extension dtypes (bfloat16) come off disk as raw void bytes and
        # are view-cast back (jax's import registers them with numpy)
        self._operands = {}
        for k, v in data.items():
            want = np.dtype(dtypes[k])
            if v.dtype != want:
                v = v.view(want)
            self._operands[k] = jax.device_put(v)
        # per-family inverse slot maps and operand key prefixes
        self._families = {}
        for name, fam in meta["families"].items():
            prefix = "" if name == "main" else f"{name}_"
            self._families[name] = {
                "slots": {int(v): k for k, v in fam["slots"].items()},
                "num_leaves": int(fam["num_leaves"]),
                "prefix": prefix,
            }
        # one exported program + jitted call per baked batch size
        self._programs = {}
        for b_str, info in meta["programs"].items():
            with open(os.path.join(path, info["file"]), "rb") as f:
                exported = jax_export.deserialize(f.read())
            # jit the exported call once: exported.call re-traces per
            # invocation otherwise (the executable itself is cached either
            # way, but tracing is host time on the serving path)
            call = jax.jit(
                lambda args, kwargs, _e=exported: _e.call(*args, **kwargs)
            )
            self._programs[int(b_str)] = {
                "exported": exported,
                "call": call,
                "family": info["family"],
            }
        self.batches = sorted(self._programs)
        self._iou = np.float32(meta["default_iou_threshold"])
        self._score = np.float32(meta["default_score_threshold"])
        self._compiled = self._try_load_compiled(path)

    def _try_load_compiled(self, path: str):
        """Opportunistically load the shipped AUTO-layout executable
        (compiled_auto.pkl): same device kind + jax version only, silent
        fallback to the portable StableHLO program otherwise.  Restores
        the live model's full throughput (the in-program input relayout
        copy the AUTO layout eliminates — docs/PERFORMANCE.md round 3)."""
        import jax

        meta = self.metadata.get("compiled_auto")
        sidecar = os.path.join(path, _COMPILED_AUTO_FILE)
        if not meta or not os.path.exists(sidecar):
            return None
        try:
            dev = jax.devices()[0]
            if (
                dev.device_kind != meta["device_kind"]
                or jax.__version__ != meta["jax_version"]
            ):
                return None
            import pickle
            import zlib

            from jax.experimental import serialize_executable as se

            with open(sidecar, "rb") as f:
                blob = pickle.load(f)
            payload = (
                zlib.decompress(blob["payload_zlib"])
                if "payload_zlib" in blob
                else blob["payload"]
            )
            # single-device serving program: pin execution to device 0
            # (the default is ALL local devices, which mis-shards on
            # multi-device hosts, e.g. the 8-virtual-CPU test env)
            loaded = se.deserialize_and_load(
                payload,
                blob["in_tree"],
                blob["out_tree"],
                execution_devices=[dev],
            )
            fam = self._families[meta["family"]]
            # stage the stored operands into the executable's chosen
            # input formats (leaf order identical to the StableHLO
            # program's: same argument pytree)
            fmt_leaves, _ = jax.tree_util.tree_flatten(
                loaded.input_formats
            )
            if len(fmt_leaves) != fam["num_leaves"]:
                return None
            operands = {}
            slot_formats = {}
            for i in range(fam["num_leaves"]):
                if i in fam["slots"]:
                    slot_formats[fam["slots"][i]] = fmt_leaves[i]
                else:
                    key = f"{fam['prefix']}op_{i:05d}"
                    operands[key] = jax.device_put(
                        self._operands[key], fmt_leaves[i]
                    )
            return {
                "program": loaded,
                "operands": operands,
                "slot_formats": slot_formats,
                "batch": int(meta["batch"]),
                "family": meta["family"],
            }
        except Exception:  # noqa: BLE001 — portability fallback by design
            return None

    def set_nms_operating_point(
        self,
        boxes_iou_threshold: Optional[float] = None,
        labels_probability_threshold: Optional[float] = None,
    ) -> None:
        if boxes_iou_threshold is not None:
            self._iou = np.float32(boxes_iou_threshold)
        if labels_probability_threshold is not None:
            self._score = np.float32(labels_probability_threshold)

    def prepare_input(self, images):
        """Stage an input batch in the serving program's preferred device
        format (mirrors `InferenceModel.prepare_input`); plain device
        placement when the shipped compiled executable is not in use or
        was compiled for a different batch size."""
        import jax

        if (
            self._compiled is not None
            and np.shape(images)[0] == self._compiled["batch"]
        ):
            return jax.device_put(
                images, self._compiled["slot_formats"]["images"]
            )
        return jax.device_put(images)

    def __call__(self, images):
        import jax

        shape = tuple(np.shape(images))
        hwc = tuple(self.metadata["image_shape"][1:])
        b = shape[0] if len(shape) == 4 else None
        if len(shape) != 4 or shape[1:] != hwc or b not in self._programs:
            raise ValueError(
                f"bundle was exported for images of shape "
                f"({'|'.join(map(str, self.batches))}, "
                f"{', '.join(map(str, hwc))}), got {shape} — use "
                "predict_batched for arbitrary N, or re-export with this "
                "batch size included"
            )
        runtime = {
            "images": images,
            "iou_threshold": self._iou,
            "score_threshold": self._score,
        }
        prog = self._programs[b]
        if self._compiled is not None and self._compiled["batch"] == b:
            fam = self._families[self._compiled["family"]]
            slots, prefix = fam["slots"], fam["prefix"]
            fmts = self._compiled["slot_formats"]
            leaves = [
                jax.device_put(runtime[slots[i]], fmts[slots[i]])
                if i in slots
                else self._compiled["operands"][f"{prefix}op_{i:05d}"]
                for i in range(fam["num_leaves"])
            ]
            args, kwargs = jax.tree_util.tree_unflatten(
                prog["exported"].in_tree, leaves
            )
            return self._compiled["program"](*args, **kwargs)
        fam = self._families[prog["family"]]
        slots, prefix = fam["slots"], fam["prefix"]
        leaves = [
            runtime[slots[i]]
            if i in slots
            else self._operands[f"{prefix}op_{i:05d}"]
            for i in range(fam["num_leaves"])
        ]
        args, kwargs = jax.tree_util.tree_unflatten(
            prog["exported"].in_tree, leaves
        )
        return prog["call"](args, kwargs)

    def predict(self, images):
        """NumPy-in/NumPy-out convenience, matching
        `InferenceModel.predict`'s output conventions — including the
        host-side background-box filter (reference layers.py:165-166)
        when the exporting model was built with
        suppress_background_boxes=True (recorded in metadata; absent in
        pre-filter bundles, which never suppressed)."""
        from ssdseglib_tpu.utils.serving import format_outputs

        mask, det = self(images)
        return format_outputs(
            mask, det, self.metadata.get("suppress_background_boxes", False)
        )

    def predict_batched(self, images):
        """Serve an arbitrary number of images through the bundle's baked
        batch sizes, with `predict`'s output conventions — the
        deployed-artifact mirror of `InferenceModel.predict_batched`.
        Each chunk routes to the LARGEST-FIT baked program
        (`utils.serving.plan_batched_chunks`): a b1+b16 bundle serves one
        image at b1 latency, 35 images as 16+16+1+1+1 with zero padding."""
        from ssdseglib_tpu.utils.serving import (
            format_outputs,
            predict_batched_chunks_multi,
        )

        mask, det = predict_batched_chunks_multi(
            images,
            self.batches,
            lambda chunk: self(self.prepare_input(chunk)),
        )
        return format_outputs(
            mask, det, self.metadata.get("suppress_background_boxes", False)
        )


def load_serving_bundle(path: str) -> ServingBundle:
    """Load a bundle written by `save_serving_bundle`."""
    return ServingBundle(path)
