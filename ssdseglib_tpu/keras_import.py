"""Keras checkpoint import: name-mapped weight transfer into Flax variables.

The parity linchpin (SURVEY.md §7.4): the reference ships a trained Keras
checkpoint (`models/mobilenetv2-deeplabv3plus-ssdlite-105-epoch.keras`,
absent from this mount) whose weights must load into the Flax model.  The
importer core consumes a ``{keras_layer_name: [arrays...]}`` dict — obtainable
from a live Keras model (`weights_by_layer`), a TF-2.13 ``.keras`` zip
(`load_keras_file`), or any other source — and produces a Flax variables
pytree via an explicit per-layer mapping table generated from the same
naming scheme the reference builder uses (reference models.py:62-111,
blocks.py:25-155).

Layout transforms:
    Conv2D kernel        (kh, kw, Cin, Cout)  ->  unchanged (HWIO == Flax)
    DepthwiseConv2D      (kh, kw, C, 1)       ->  (kh, kw, 1, C)
    SeparableConv2D dw   (kh, kw, Cin, 1)     ->  (kh, kw, 1, Cin)
    SeparableConv2D pw   (1, 1, Cin, Cout)    ->  unchanged
    BatchNormalization   [gamma, beta, moving_mean, moving_var]
                         -> params.scale/.bias + batch_stats.mean/.var
"""

from __future__ import annotations

import dataclasses
from typing import Any, Dict, List, Optional, Sequence, Tuple

import numpy as np

from ssdseglib_tpu.config import ModelConfig


@dataclasses.dataclass(frozen=True)
class LayerMap:
    """One Flax module <-> Keras layer(s) correspondence."""

    flax_path: Tuple[str, ...]  # path of the Flax module in params
    kind: str  # 'convbn' | 'conv' | 'conv_bias' | 'depthwisebn' | 'sepconvbn'
    keras_conv: str  # Keras conv-ish layer name
    keras_bn: Optional[str] = None  # Keras batchnorm layer name (if any)


def _mobilenetv2_maps() -> List[LayerMap]:
    maps: List[LayerMap] = []

    def convbn(path, base):
        maps.append(LayerMap(tuple(path), "convbn", f"{base}-conv", f"{base}-batchnorm"))

    def dwbn(path, base):
        maps.append(
            LayerMap(tuple(path), "depthwisebn", f"{base}-conv", f"{base}-batchnorm")
        )

    # stem + 16 blocks (reference models.py:196-210 channel plan)
    convbn(["backbone", "backbone-block0-expand"], "backbone-block0-expand")
    dwbn(["backbone", "backbone-block0-depthwise"], "backbone-block0-depthwise")
    convbn(["backbone", "backbone-block0-project"], "backbone-block0-project")
    for block in range(1, 17):
        convbn(
            ["backbone", f"backbone-block{block}-expand"],
            f"backbone-block{block}-expand",
        )
        dwbn(
            ["backbone", f"backbone-block{block}-depthwise"],
            f"backbone-block{block}-depthwise",
        )
        convbn(
            ["backbone", f"backbone-block{block}-project"],
            f"backbone-block{block}-project",
        )
    # extra detection feature blocks (models.py:234-244)
    for block in (17, 18):
        maps.append(
            LayerMap(
                (f"backbone-block{block}",),
                "sepconvbn",
                f"backbone-block{block}-sepconv",
                f"backbone-block{block}-batchnorm",
            )
        )
    return maps


def _shufflenetv2_maps(cfg: ModelConfig) -> List[LayerMap]:
    maps: List[LayerMap] = [
        LayerMap(("backbone", "backbone-stage1-conv"), "conv_bias",
                 "backbone-stage1-conv")
    ]
    extra_dw = cfg.shufflenet_extra_depthwise

    def dwbn(path, conv, bn):
        maps.append(LayerMap(tuple(path), "depthwisebn", conv, bn))

    def convbn(path, conv, bn):
        maps.append(LayerMap(tuple(path), "convbn", conv, bn))

    for stage, n_blocks in ((2, 3), (3, 7), (4, 3)):
        p = f"backbone-stage{stage}-downblock-"
        dwbn(["backbone", f"{p}branch-left-depthconv1"],
             f"{p}branch-left-depthconv1", f"{p}branch-left-batchnorm1")
        convbn(["backbone", f"{p}branch-left-conv2"],
               f"{p}branch-left-conv2", f"{p}branch-left-batchnorm2")
        if extra_dw:
            dwbn(["backbone", f"{p}branch-right-depthconv0"],
                 f"{p}branch-right-depthconv0", f"{p}branch-right-batchnorm0")
        convbn(["backbone", f"{p}branch-right-conv1"],
               f"{p}branch-right-conv1", f"{p}branch-right-batchnorm1")
        dwbn(["backbone", f"{p}branch-right-depthconv2"],
             f"{p}branch-right-depthconv2", f"{p}branch-right-batchnorm2")
        convbn(["backbone", f"{p}branch-right-conv3"],
               f"{p}branch-right-conv3", f"{p}branch-right-batchnorm3")
        for b in range(1, n_blocks + 1):
            p = f"backbone-stage{stage}-block{b}-"
            if extra_dw:
                dwbn(["backbone", f"{p}branch-conv-depthconv0"],
                     f"{p}branch-conv-depthconv0", f"{p}branch-conv-batchnorm0")
            convbn(["backbone", f"{p}branch-conv-conv1"],
                   f"{p}branch-conv-conv1", f"{p}branch-conv-batchnorm1")
            dwbn(["backbone", f"{p}branch-conv-depthconv2"],
                 f"{p}branch-conv-depthconv2", f"{p}branch-conv-batchnorm2")
            convbn(["backbone", f"{p}branch-conv-conv3"],
                   f"{p}branch-conv-conv3", f"{p}branch-conv-batchnorm3")
    for block in (1, 2):
        maps.append(
            LayerMap(
                (f"backbone-stage5-block{block}",),
                "sepconvbn",
                f"backbone-stage5-block{block}-sepconv",
                f"backbone-stage5-block{block}-batchnorm",
            )
        )
    return maps


def _head_maps(cfg: ModelConfig) -> List[LayerMap]:
    maps: List[LayerMap] = []
    # DeepLabV3+ encoder (reference blocks.py:25-72 naming)
    maps.append(
        LayerMap(("mask-encoder", "aspp-pointwise"), "convbn",
                 "mask-encoder-aspp-pointwise-conv",
                 "mask-encoder-aspp-pointwise-batchnorm")
    )
    for k in (1, 2, 3):
        maps.append(
            LayerMap(("mask-encoder", f"aspp-atrous{k}"), "sepconvbn",
                     f"mask-encoder-aspp-atrous{k}-sepconv",
                     f"mask-encoder-aspp-atrous{k}-batchnorm")
        )
    maps.append(
        LayerMap(("mask-encoder", "pooling"), "convbn",
                 "mask-encoder-pooling-conv", "mask-encoder-pooling-batchnorm")
    )
    maps.append(
        LayerMap(("mask-encoder", "output"), "convbn",
                 "mask-encoder-output-conv", "mask-encoder-output-batchnorm")
    )
    # decoder (blocks.py:100-129 naming)
    maps.append(
        LayerMap(("mask-decoder", "backbone-reduce"), "convbn",
                 "mask-decoder-backbone-conv", "mask-decoder-backbone-batchnorm")
    )
    maps.append(
        LayerMap(("mask-decoder", "conv"), "convbn",
                 "mask-decoder-conv", "mask-decoder-conv-batchnorm")
    )
    maps.append(
        LayerMap(("mask-decoder", "sepconv"), "sepconvbn",
                 "mask-decoder-sepconv", "mask-decoder-sepconv-batchnorm")
    )
    maps.append(
        LayerMap(("mask-decoder", "output-conv"), "conv",
                 "mask-decoder-output-conv")
    )
    # SSDLite heads (models.py:250-268 naming)
    for branch in ("labels", "boxes"):
        for k in (1, 2, 3, 4):
            maps.append(
                LayerMap(("heads", f"{branch}{k}", "sepconv"), "sepconvbn",
                         f"{branch}{k}-sepconv", f"{branch}{k}-batchnorm")
            )
    return maps


def build_layer_maps(cfg: ModelConfig) -> List[LayerMap]:
    if cfg.backbone == "mobilenetv2":
        maps = _mobilenetv2_maps()
    elif cfg.backbone == "shufflenetv2":
        maps = _shufflenetv2_maps(cfg)
    else:
        raise ValueError(cfg.backbone)
    return maps + _head_maps(cfg)


# ---------------------------------------------------------------------------
# importer core
# ---------------------------------------------------------------------------

def _set_path(tree: Dict, path: Sequence[str], value) -> None:
    node = tree
    for p in path[:-1]:
        node = node.setdefault(p, {})
    node[path[-1]] = value


def import_keras_weights(
    weights_by_layer: Dict[str, List[np.ndarray]],
    cfg: ModelConfig,
) -> Dict[str, Any]:
    """Build a Flax variables pytree from Keras layer weights.

    Args:
        weights_by_layer: {keras layer name: [weight arrays in Keras order]}
        cfg: the model configuration (drives the mapping table)
    Returns:
        {'params': ..., 'batch_stats': ...}
    """
    params: Dict[str, Any] = {}
    stats: Dict[str, Any] = {}
    used = set()

    def take(name: str) -> List[np.ndarray]:
        if name not in weights_by_layer:
            raise KeyError(f"keras layer {name!r} not found in checkpoint")
        used.add(name)
        return [np.asarray(w) for w in weights_by_layer[name]]

    def put_bn(flax_path: Tuple[str, ...], keras_bn: str) -> None:
        gamma, beta, mean, var = take(keras_bn)
        _set_path(params, flax_path + ("batchnorm", "scale"), gamma)
        _set_path(params, flax_path + ("batchnorm", "bias"), beta)
        _set_path(stats, flax_path + ("batchnorm", "mean"), mean)
        _set_path(stats, flax_path + ("batchnorm", "var"), var)

    for m in build_layer_maps(cfg):
        if m.kind == "convbn":
            (kernel,) = take(m.keras_conv)
            _set_path(params, m.flax_path + ("conv", "kernel"), kernel)
            put_bn(m.flax_path, m.keras_bn)
        elif m.kind == "conv":
            (kernel,) = take(m.keras_conv)
            _set_path(params, m.flax_path + ("kernel",), kernel)
        elif m.kind == "conv_bias":
            kernel, bias = take(m.keras_conv)
            _set_path(params, m.flax_path + ("kernel",), kernel)
            _set_path(params, m.flax_path + ("bias",), bias)
        elif m.kind == "depthwisebn":
            (kernel,) = take(m.keras_conv)  # (kh, kw, C, 1)
            _set_path(
                params,
                m.flax_path + ("conv", "kernel"),
                np.transpose(kernel, (0, 1, 3, 2)),
            )
            put_bn(m.flax_path, m.keras_bn)
        elif m.kind == "sepconvbn":
            dw, pw = take(m.keras_conv)
            _set_path(
                params,
                m.flax_path + ("depthwise", "kernel"),
                np.transpose(dw, (0, 1, 3, 2)),
            )
            _set_path(params, m.flax_path + ("pointwise", "kernel"), pw)
            put_bn(m.flax_path, m.keras_bn)
        else:
            raise ValueError(m.kind)

    # completeness check, symmetric to take()'s missing-layer KeyError: a
    # checkpoint layer the mapping never consumed means the checkpoint was
    # produced by a DIFFERENT config (e.g. shufflenet_extra_depthwise
    # mismatch) and trained weights would be silently dropped
    unused = set(weights_by_layer) - used
    if unused:
        import warnings

        warnings.warn(
            f"{len(unused)} checkpoint layer(s) not consumed by the "
            f"{cfg.backbone} mapping (config mismatch?): "
            f"{sorted(unused)[:8]}{'...' if len(unused) > 8 else ''}"
        )

    return {"params": params, "batch_stats": stats}


def weights_by_layer_from_keras_model(model) -> Dict[str, List[np.ndarray]]:
    """Extract {layer name: weights} from a live Keras model."""
    return {
        layer.name: [np.asarray(w) for w in layer.get_weights()]
        for layer in model.layers
        if layer.get_weights()
    }


def load_keras_file(path: str) -> Dict[str, List[np.ndarray]]:
    """Read a TF-2.13 `.keras` zip (the reference checkpoint format) into a
    {layer name: [arrays]} dict.

    The genuine saved layout (keras saving_lib, same container walk in
    2.13 and Keras 3) addresses each layer's weight group by the
    snake-cased CLASS name plus occurrence index — NOT `layer.name`, which
    "may vary across two instances of the same model"
    (saving_lib._save_container_state) — and records the true layer name
    as the `name` ATTRIBUTE of the `vars` group
    (saving_lib._save_state metadata).  2.13 roots the groups at
    `_layer_checkpoint_dependencies/<class_snake>/vars/<i>`
    (Keras 3 uses `layers/...`; its own 2.13-compat load shim documents
    the equivalence).  So the layer key is resolved from the `vars`
    group's `name` attr when present, falling back to the path component
    (covers artifacts from simpler writers keyed by layer name directly).
    """
    import io
    import zipfile

    import h5py

    with zipfile.ZipFile(path) as zf:
        with zf.open("model.weights.h5") as fh:
            h5 = h5py.File(io.BytesIO(fh.read()), "r")

    out: Dict[str, List[np.ndarray]] = {}

    def visit(name, obj):
        if not isinstance(obj, h5py.Dataset):
            return
        parts = name.split("/")
        if "vars" not in parts[:-1]:
            return
        i = len(parts) - 2 - parts[:-1][::-1].index("vars")
        if i == 0:
            return  # top-level model vars group, not a layer
        vars_group = h5["/".join(parts[: i + 1])]
        layer = vars_group.attrs.get("name", parts[i - 1])
        if isinstance(layer, bytes):
            layer = layer.decode()
        try:
            index = int(parts[i + 1])
        except ValueError:
            # variable datasets named non-numerically: keep file order
            index = len(out.get(layer, ()))
        out.setdefault(layer, []).append((index, obj[()]))

    h5.visititems(visit)
    return {
        layer: [arr for _, arr in sorted(items)] for layer, items in out.items()
    }


def save_keras_file(
    path: str,
    weights_by_layer: Dict[str, List[np.ndarray]],
    extra_files: Optional[Dict[str, str]] = None,
) -> None:
    """Write a TF-2.13-layout ``.keras`` zip (the reference checkpoint
    format produced by `model.save` — reference notebook 03 cell 17):
    a zip holding metadata.json / config.json / model.weights.h5 in the
    genuine member order, with weight groups addressed the way keras
    saving_lib addresses them —
    ``_layer_checkpoint_dependencies/<class_snake[_k]>/vars/<i>`` with the
    true layer name recorded as the ``vars`` group's ``name`` attribute
    (the class is inferred from this repo's layer-name suffix
    conventions; the loader keys by the attribute, so the group name is
    structural fidelity, not a correctness requirement).

    ``extra_files`` maps additional zip member names to string contents
    (used by the `ssdseglib` compat facade to embed the model config so
    `load_model` can rebuild the module).  Round-trips through
    `load_keras_file`.
    """
    import io
    import json
    import zipfile

    import h5py

    def class_snake(layer: str) -> str:
        # suffix -> keras class, per this repo's reference-mirroring layer
        # naming (models/mobilenetv2.py, models/heads.py)
        if layer.endswith("-batchnorm"):
            return "batch_normalization"
        if layer.endswith("-sepconv"):
            return "separable_conv2d"
        if layer.endswith("-depthwise-conv") or layer.endswith("-depthwise"):
            return "depthwise_conv2d"
        if layer.endswith("-conv"):
            return "conv2d"
        return "layer"

    buf = io.BytesIO()
    used: Dict[str, int] = {}
    with h5py.File(buf, "w") as h5:
        root = h5.create_group("_layer_checkpoint_dependencies")
        for layer, arrays in weights_by_layer.items():
            base = class_snake(layer)
            k = used.get(base)
            used[base] = 0 if k is None else k + 1
            group = base if k is None else f"{base}_{used[base]}"
            g = root.create_group(group).create_group("vars")
            g.attrs["name"] = layer
            for i, arr in enumerate(arrays):
                g.create_dataset(str(i), data=np.asarray(arr))
    with zipfile.ZipFile(path, "w") as zf:
        zf.writestr("metadata.json", json.dumps({"keras_version": "2.13.1"}))
        zf.writestr("config.json", json.dumps({"class_name": "Functional"}))
        zf.writestr("model.weights.h5", buf.getvalue())
        for name, content in (extra_files or {}).items():
            zf.writestr(name, content)


def _get_path(tree: Dict, path: Sequence[str]):
    node = tree
    for p in path:
        node = node[p]
    return node


def export_keras_weights(
    variables: Dict[str, Any], cfg: ModelConfig
) -> Dict[str, List[np.ndarray]]:
    """Inverse of `import_keras_weights`: Flax variables -> Keras layer dict.

    Produces ``{keras layer name: [weights in Keras order]}`` ready for
    `apply_to_keras_model` (or for packaging into a checkpoint), so models
    trained in this framework can flow back to reference-era tooling.
    """
    params = variables["params"]
    stats = variables.get("batch_stats", {})
    out: Dict[str, List[np.ndarray]] = {}

    def bn(flax_path: Tuple[str, ...], keras_bn: str) -> None:
        out[keras_bn] = [
            np.asarray(_get_path(params, flax_path + ("batchnorm", "scale"))),
            np.asarray(_get_path(params, flax_path + ("batchnorm", "bias"))),
            np.asarray(_get_path(stats, flax_path + ("batchnorm", "mean"))),
            np.asarray(_get_path(stats, flax_path + ("batchnorm", "var"))),
        ]

    for m in build_layer_maps(cfg):
        if m.kind == "convbn":
            out[m.keras_conv] = [
                np.asarray(_get_path(params, m.flax_path + ("conv", "kernel")))
            ]
            bn(m.flax_path, m.keras_bn)
        elif m.kind == "conv":
            out[m.keras_conv] = [
                np.asarray(_get_path(params, m.flax_path + ("kernel",)))
            ]
        elif m.kind == "conv_bias":
            out[m.keras_conv] = [
                np.asarray(_get_path(params, m.flax_path + ("kernel",))),
                np.asarray(_get_path(params, m.flax_path + ("bias",))),
            ]
        elif m.kind == "depthwisebn":
            kernel = np.asarray(_get_path(params, m.flax_path + ("conv", "kernel")))
            out[m.keras_conv] = [np.transpose(kernel, (0, 1, 3, 2))]
            bn(m.flax_path, m.keras_bn)
        elif m.kind == "sepconvbn":
            dw = np.asarray(_get_path(params, m.flax_path + ("depthwise", "kernel")))
            pw = np.asarray(_get_path(params, m.flax_path + ("pointwise", "kernel")))
            out[m.keras_conv] = [np.transpose(dw, (0, 1, 3, 2)), pw]
            bn(m.flax_path, m.keras_bn)
        else:
            raise ValueError(m.kind)
    return out


def apply_to_keras_model(model, weights_by_layer: Dict[str, List[np.ndarray]]):
    """Load a `{layer name: [weights]}` dict into a live Keras model."""
    for layer in model.layers:
        if layer.get_weights():
            if layer.name not in weights_by_layer:
                raise KeyError(f"no exported weights for layer {layer.name!r}")
            layer.set_weights(weights_by_layer[layer.name])
    return model


def validate_against_template(variables: Dict, template: Dict) -> None:
    """Check the imported tree matches the model's init shapes exactly."""
    import jax

    imported = jax.tree_util.tree_flatten_with_path(variables)[0]
    expected = jax.tree_util.tree_flatten_with_path(template)[0]
    exp = {tuple(str(k) for k in kp): leaf.shape for kp, leaf in expected}
    imp = {tuple(str(k) for k in kp): leaf.shape for kp, leaf in imported}
    missing = set(exp) - set(imp)
    extra = set(imp) - set(exp)
    if missing or extra:
        raise ValueError(
            f"import mismatch: missing={sorted(missing)[:5]} "
            f"extra={sorted(extra)[:5]}"
        )
    for k in exp:
        if tuple(exp[k]) != tuple(imp[k]):
            raise ValueError(f"{k}: shape {imp[k]} != expected {exp[k]}")
