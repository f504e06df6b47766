"""Model assembly: joint SSDLite + DeepLabV3+ network and builder API.

TPU-native counterpart of reference ssdseglib/models.py.  The reference
builds a Keras graph for training, then *rebuilds* a second graph for
inference and copies weights across by layer name (models.py:345-423).  In
the functional JAX design both phases share one parameter pytree: the
training model is `module.apply(variables, images, train=True)` and the
inference model is the same apply plus jitted post-processing (decode ->
segmentation suppression -> NMS) — no weight transfer step can go wrong.
"""

from __future__ import annotations

import dataclasses
import functools
from typing import Dict, Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from ssdseglib_tpu.config import ModelConfig
from ssdseglib_tpu.layers import (
    DecodeBoxesCentroidsOffsets,
    NonMaximumSuppression,
    SegmentationSuppression,
)
from ssdseglib_tpu.models.blocks import SepConvBN
from ssdseglib_tpu.models.heads import (
    DeepLabV3PlusDecoder,
    DeepLabV3PlusEncoder,
    SsdLiteHeads,
)
from ssdseglib_tpu.models.mobilenetv2 import MobileNetV2Backbone
from ssdseglib_tpu.models.shufflenetv2 import STAGE_CHANNELS, ShuffleNetV2Backbone


def _backbone_head_config(cfg: ModelConfig):
    """Per-backbone head wiring: relu cap + extra pyramid block specs."""
    if cfg.backbone == "mobilenetv2":
        return 6.0, ((320, "backbone-block17"), (360, "backbone-block18"))
    if cfg.backbone == "shufflenetv2":
        c4 = STAGE_CHANNELS[cfg.shufflenet_size][4]
        return 0.0, ((c4, "backbone-stage5-block1"), (c4, "backbone-stage5-block2"))
    raise ValueError(f"unknown backbone {cfg.backbone!r}")


def _apply_heads(cfg: ModelConfig, fm1, fm2, skip, train: bool):
    """Head wiring shared by SsdSegModel and SsdSegHeads.

    Runs inside the caller's compact scope; every module name is explicit,
    so both callers produce identical parameter paths.
    """
    relu_max, extra = _backbone_head_config(cfg)

    # two extra stride-2 feature maps for the detection pyramid
    # (reference models.py:232-244 / :669-679)
    fm3 = SepConvBN(
        extra[0][0], kernel_size=3, strides=2, relu_max=relu_max,
        name=extra[0][1],
    )(fm2, train)
    fm4 = SepConvBN(
        extra[1][0], kernel_size=3, strides=2, relu_max=relu_max,
        name=extra[1][1],
    )(fm3, train)

    mask_encoder = DeepLabV3PlusEncoder(
        filters=256,
        dilation_rates=cfg.segmentation_dilation_rates,
        relu_max=relu_max,
        name="mask-encoder",
    )(fm1, train)
    mask = DeepLabV3PlusDecoder(
        filters_backbone=48,
        filters_decoder=256,
        output_height_width=cfg.input_image_shape[:2],
        output_channels=cfg.number_of_classes,
        relu_max=relu_max,
        name="mask-decoder",
    )(mask_encoder, skip, train)

    head_relu_max = (
        cfg.detection_head_relu_max
        if cfg.detection_head_relu_max is not None
        else relu_max
    )
    labels, boxes = SsdLiteHeads(
        boxes_per_point=cfg.boxes_per_point,
        number_of_classes=cfg.number_of_classes,
        relu_max=head_relu_max,
        name="heads",
    )([fm1, fm2, fm3, fm4], train)

    return {"output-mask": mask, "output-labels": labels, "output-boxes": boxes}


class SsdSegModel(nn.Module):
    """Backbone + DeepLabV3+ mask head + SSDLite detection heads.

    Outputs a dict keyed like the reference model's named outputs
    (reference models.py:338): 'output-mask' (B, H, W, C) softmax,
    'output-labels' (B, N, 4) softmax, 'output-boxes' (B, N, num_classes)
    raw offsets.  (The 4 / num_classes channel quirk is inherited from the
    reference heads — see models/heads.py.)
    """

    cfg: ModelConfig

    @nn.compact
    def __call__(
        self, images: jnp.ndarray, train: bool = False
    ) -> Dict[str, jnp.ndarray]:
        cfg = self.cfg
        # rescale [0, 255] -> [-1, 1] (reference models.py:187)
        x = images / 127.5 - 1.0

        if cfg.backbone == "mobilenetv2":
            _, taps = MobileNetV2Backbone(name="backbone")(x, train)
            fm1 = taps["backbone-block13-expand-relu6"]  # os16
            fm2 = taps["backbone-block16-project-batchnorm"]  # os32
            skip = taps["backbone-block3-expand-relu6"]  # os4
        elif cfg.backbone == "shufflenetv2":
            _, taps = ShuffleNetV2Backbone(
                model_size=cfg.shufflenet_size,
                use_additional_depthwise_convolution=cfg.shufflenet_extra_depthwise,
                use_residual_connections=cfg.shufflenet_residuals,
                name="backbone",
            )(x, train)
            fm1 = taps["backbone-stage3-block7"]  # os16
            fm2 = taps["backbone-stage4-block3"]  # os32
            skip = taps["backbone-stage2-block3"]  # os8
        else:
            raise ValueError(f"unknown backbone {cfg.backbone!r}")

        return _apply_heads(cfg, fm1, fm2, skip, train)


class SsdSegHeads(nn.Module):
    """Heads-only module for fused-backbone inference.

    Consumes the three backbone feature taps; its parameter paths are
    identical to the corresponding top-level entries of SsdSegModel
    (backbone-block17/18 or stage5 blocks, mask-encoder, mask-decoder,
    heads), so the full model's variables slice straight in.
    """

    cfg: ModelConfig

    @nn.compact
    def __call__(self, fm1, fm2, skip, train: bool = False):
        return _apply_heads(self.cfg, fm1, fm2, skip, train)


def count_parameters(variables) -> Tuple[int, int]:
    """(trainable, non-trainable) parameter counts, Keras-summary style."""
    trainable = sum(
        np.prod(p.shape) for p in jax.tree_util.tree_leaves(variables.get("params", {}))
    )
    stats = sum(
        np.prod(p.shape)
        for p in jax.tree_util.tree_leaves(variables.get("batch_stats", {}))
    )
    return int(trainable), int(stats)


@dataclasses.dataclass
class TrainableModel:
    """A model ready for training: module + init/apply helpers."""

    module: SsdSegModel
    cfg: ModelConfig

    def init(self, rng: jax.Array, batch_size: int = 1):
        shape = (batch_size,) + tuple(self.cfg.input_image_shape)
        return self.module.init(
            rng, jnp.zeros(shape, dtype=jnp.float32), train=False
        )

    def apply(self, variables, images, train: bool = False, rngs=None):
        """Forward pass.  In train mode returns (outputs, new_batch_stats)."""
        if train:
            outputs, mutated = self.module.apply(
                variables, images, train=True, mutable=["batch_stats"], rngs=rngs
            )
            return outputs, mutated["batch_stats"]
        return self.module.apply(variables, images, train=False)

    def parameter_counts(self, variables) -> Tuple[int, int]:
        return count_parameters(variables)


def _format_mask(mask: jnp.ndarray, mask_output: str) -> jnp.ndarray:
    """Serving mask output format: 'float32' probabilities (reference
    behavior), 'bfloat16' probabilities (halves the 4.9-MP-per-image
    output materialization + transfer), or 'class_map' (uint8 argmax —
    what most consumers compute anyway, 1/16th the bytes)."""
    if mask_output == "float32":
        return mask.astype(jnp.float32)
    if mask_output == "bfloat16":
        return mask.astype(jnp.bfloat16)
    if mask_output == "class_map":
        return jnp.argmax(mask, axis=-1).astype(jnp.uint8)
    raise ValueError(
        f"mask_output must be 'float32', 'bfloat16' or 'class_map'; "
        f"got {mask_output!r}"
    )


@functools.lru_cache(maxsize=64)
def _serving_programs(
    module: SsdSegModel,
    stds: Tuple[float, float, float, float],
    use_segmentation_suppression: bool,
    max_boxes_per_class: int,
    max_boxes_per_sample: int,
    compute_dtype_str: str,
    mask_output: str,
    max_candidates_per_class: int = 256,
):
    """Shared jitted serving programs, cached on the STATIC configuration.

    The NMS thresholds and anchor constants are traced ARGUMENTS, so every
    `InferenceModel` over the same architecture + static NMS budget shares
    ONE compiled executable across operating points — the reference (and a
    naive port) rebuilds and recompiles the whole graph per grid point
    during NMS hypertuning (reference notebook 03 cell 21: 9 combos).
    """
    from ssdseglib_tpu.ops.encoding import decode_predictions_to_corners_yx

    compute_dtype = jnp.dtype(compute_dtype_str)
    seg_suppression = SegmentationSuppression(
        num_classes=4  # reference hardcodes depth=4 (layers.py:204)
    )
    nms_core = NonMaximumSuppression(
        max_number_of_boxes_per_class=max_boxes_per_class,
        max_number_of_boxes_per_sample=max_boxes_per_sample,
        boxes_iou_threshold=0.0,  # overridden per call
        labels_probability_threshold=0.0,
        suppress_background_boxes=False,
        max_candidates_per_class=max_candidates_per_class,
    )

    def pre_nms(variables, anchors_centroids, images):
        out = module.apply(variables, images.astype(compute_dtype), train=False)
        mask = out["output-mask"].astype(jnp.float32)
        labels = out["output-labels"].astype(jnp.float32)
        if use_segmentation_suppression:
            labels = seg_suppression(mask, labels)
        boxes_yx = decode_predictions_to_corners_yx(
            out["output-boxes"].astype(jnp.float32), anchors_centroids, stds
        )
        return mask, labels, boxes_yx

    def forward(variables, anchors_centroids, images, iou_thr, score_thr):
        mask, labels, boxes_yx = pre_nms(variables, anchors_centroids, images)
        detections = nms_core(
            boxes_yx, labels, iou_threshold=iou_thr, score_threshold=score_thr
        )
        return _format_mask(mask, mask_output), detections

    return jax.jit(forward), jax.jit(pre_nms)


class InferenceModel:
    """Jitted end-to-end inference: forward -> decode -> gate -> NMS.

    Functional equivalent of the reference inference-graph transform
    (reference models.py:345-423).  `predict` returns
    (mask (B, H, W, C), detections (B, T, 6)) with detection rows
    [label, probability, xmin, ymin, xmax, ymax].
    """

    def __init__(
        self,
        module: SsdSegModel,
        variables,
        decode: DecodeBoxesCentroidsOffsets,
        nms: NonMaximumSuppression,
        use_segmentation_suppression: bool,
        suppress_background_boxes: bool,
        compute_dtype: str = "float32",
        mesh=None,
        fused_backbone: bool = False,
        mask_output: str = "float32",
        fused_max_batch: int = 16,
        input_layout: str = "default",
        input_layout_batch: int = 16,
        quantize_pointwise: bool = False,
        calibration_images=None,
    ) -> None:
        """compute_dtype: 'bfloat16' selects the serving fast path — params
        and conv compute in bf16 on the MXU (+~25% throughput on v5e, mask
        probabilities within ~1e-3 of f32); postprocessing (decode, gating,
        NMS) always runs in f32.

        mesh: optional `jax.sharding.Mesh` — inference batches are sharded
        over the mesh's data axis with replicated params (multi-chip
        batch-parallel serving; XLA handles the one cross-chip reduction in
        the batch-global segmentation suppression).

        fused_backbone: run the MobileNetV2 backbone through the fused
        Pallas MBConv path (BN folded, expanded tensors VMEM-resident —
        models/fused_inference.py).

        mask_output: 'float32' (reference-parity probabilities, default),
        'bfloat16' (half-size probability output), or 'class_map' (uint8
        argmax map) — see `_format_mask`.

        fused_max_batch: largest batch served through the fused Pallas
        path.  This container's remote-compile helper crashes compiling
        the full fused graph above batch 16 (environmental — see
        docs/PERFORMANCE.md "batch > 16 root cause"); larger batches
        auto-fall back to the plain-XLA backbone with a one-time warning
        instead of crashing.

        input_layout: 'auto' additionally AOT-compiles the serving program
        for `input_layout_batch` with XLA-chosen ('AUTO') input layouts —
        the in-program relayout of the NHWC uint8 input (~0.42 ms/batch-16
        on v5e, the last non-model op in the round-3 profile) disappears
        when callers stage inputs via `prepare_input` (or pass host
        arrays, which upload directly into the chosen tiling).  Off-shape
        batches and device arrays in the default layout fall back to the
        regular program.  Not combined with `mesh`."""
        if mask_output not in ("float32", "bfloat16", "class_map"):
            raise ValueError(
                "mask_output must be 'float32', 'bfloat16' or 'class_map', "
                f"got {mask_output!r}"
            )
        if quantize_pointwise and not fused_backbone:
            raise ValueError(
                "quantize_pointwise requires fused_backbone=True (the int8 "
                "pointwise convs live in the folded-heads serving path)"
            )
        self.module = module
        variables_f32 = variables  # keep full precision for BN folding
        self.variables = variables
        self._suppress_background = suppress_background_boxes
        self._compute_dtype = jnp.dtype(compute_dtype)
        self._mask_output = mask_output
        self.mesh = mesh
        if self._compute_dtype != jnp.float32:
            self.variables = jax.tree_util.tree_map(
                lambda a: a.astype(self._compute_dtype), variables
            )
        # pin params on device once — host-resident (numpy) variables would
        # otherwise re-upload through the host link on every call
        if mesh is None:
            self.variables = jax.device_put(self.variables)
        if mesh is not None:
            from ssdseglib_tpu.parallel import mesh as mesh_lib

            self.variables = mesh_lib.replicate(mesh, self.variables)

        # runtime-tunable NMS operating point: device scalars fed to the
        # jitted program (see set_nms_operating_point)
        self._iou_threshold = jnp.float32(nms.config.iou_threshold)
        self._score_threshold = jnp.float32(nms.config.score_threshold)
        self._anchors_centroids = decode.anchors_centroids

        fused_forward = None
        self._fused_forward = None
        if fused_backbone:
            from ssdseglib_tpu.models.fused_inference import make_fused_forward

            # fold BN from the f32 variables, then cast to the compute dtype
            fused_forward = make_fused_forward(
                module.cfg, variables_f32, compute_dtype=self._compute_dtype,
                quantize_pointwise=quantize_pointwise,
                calibration_images=calibration_images,
            )
            self._fused_forward = fused_forward

        if fused_forward is not None:
            # folded weights are baked into this instance's program; keep
            # per-instance jit (thresholds still traced args)
            seg_suppression = SegmentationSuppression(num_classes=4)
            nms_core = NonMaximumSuppression(
                max_number_of_boxes_per_class=nms.config.max_boxes_per_class,
                max_number_of_boxes_per_sample=nms.config.max_boxes_per_sample,
                boxes_iou_threshold=0.0,
                labels_probability_threshold=0.0,
                suppress_background_boxes=False,
                max_candidates_per_class=nms.config.max_candidates_per_class,
            )
            stds = decode.standard_deviations

            def core(variables, anchors_centroids, images):
                from ssdseglib_tpu.ops.encoding import (
                    decode_predictions_to_corners_yx,
                )

                out = fused_forward(images)
                # mask stays in the compute dtype: casting the 4.9-MP-per-
                # image probability tensor to f32 and back costs ~0.3 ms of
                # HBM traffic per batch-16; the seg-suppression argmax and
                # _format_mask consume any float dtype
                mask = out["output-mask"]
                labels = out["output-labels"].astype(jnp.float32)
                if use_segmentation_suppression:
                    labels = seg_suppression(mask, labels)
                boxes_yx = decode_predictions_to_corners_yx(
                    out["output-boxes"].astype(jnp.float32),
                    anchors_centroids,
                    stds,
                )
                return mask, labels, boxes_yx

            def pre_nms(variables, anchors_centroids, images):
                mask, labels, boxes_yx = core(
                    variables, anchors_centroids, images
                )
                return mask.astype(jnp.float32), labels, boxes_yx

            def forward(variables, anchors_centroids, images, iou_thr, score_thr):
                mask, labels, boxes_yx = core(
                    variables, anchors_centroids, images
                )
                detections = nms_core(
                    boxes_yx, labels,
                    iou_threshold=iou_thr, score_threshold=score_thr,
                )
                return _format_mask(mask, mask_output), detections

            self._forward_program = jax.jit(forward)
            self._pre_nms_program = jax.jit(pre_nms)
            # plain-XLA programs for batches beyond the fused path's
            # validated ceiling (auto-fallback, see fused_max_batch)
            self._fused_max_batch = int(fused_max_batch)
            self._fallback_programs = _serving_programs(
                module,
                decode.standard_deviations,
                use_segmentation_suppression,
                nms.config.max_boxes_per_class,
                nms.config.max_boxes_per_sample,
                str(self._compute_dtype),
                mask_output,
                nms.config.max_candidates_per_class,
            )
            self._fused_fallback_warned = False
        else:
            self._fused_max_batch = None
            self._fallback_programs = None
            self._forward_program, self._pre_nms_program = _serving_programs(
                module,
                decode.standard_deviations,
                use_segmentation_suppression,
                nms.config.max_boxes_per_class,
                nms.config.max_boxes_per_sample,
                str(self._compute_dtype),
                mask_output,
                nms.config.max_candidates_per_class,
            )

        self._auto = None
        if input_layout not in ("default", "auto"):
            raise ValueError(
                f"input_layout must be 'default' or 'auto', got {input_layout!r}"
            )
        if input_layout == "auto":
            if mesh is not None:
                raise ValueError("input_layout='auto' is single-device only")
            self._build_auto_program(int(input_layout_batch))

    def _build_auto_program(self, batch: int) -> None:
        """AOT-compile the serving forward with XLA-chosen input layouts
        (jax.experimental.layout Layout.AUTO) for one batch shape, and
        pre-stage the weight/anchor/threshold operands into the chosen
        formats.  Kills the in-program input relayout copy — measured
        11.35 -> 10.87 ms/batch-16 on v5e
        (tests/tpu_scripts/input_layout_probe.py)."""
        from jax.experimental.layout import Format, Layout

        h, w, c = self.module.cfg.input_image_shape
        # same batch-ceiling rule as _forward: never AOT-compile the fused
        # program above its validated batch (compile-helper crash —
        # docs/PERFORMANCE.md "batch > 16 root cause")
        use_fused = (
            self._fused_forward is not None
            and (self._fused_max_batch is None
                 or batch <= self._fused_max_batch)
        )
        # derive the program from the SAME predicate as use_fused (mirrors
        # export.save_serving_bundle) so an unfused _forward_program can
        # never be lowered against the empty fused variables tree
        base_program = (
            self._forward_program
            if (use_fused or self._fallback_programs is None)
            else self._fallback_programs[0]
        )
        # fused programs bake the folded weights in as constants and never
        # read `variables`: compile the AUTO executable over an empty tree
        # so the live model doesn't pin a second AUTO-format weight copy
        # and exported bundles (export.py, same convention) stay aligned
        auto_variables = {} if use_fused else self.variables
        auto_jit = jax.jit(
            lambda v, a, im, it, st: base_program(v, a, im, it, st),
            in_shardings=Format(Layout.AUTO),
        )
        compiled = auto_jit.lower(
            auto_variables,
            self._anchors_centroids,
            jax.ShapeDtypeStruct((batch, h, w, c), jnp.uint8),
            self._iou_threshold,
            self._score_threshold,
        ).compile()
        (v_fmt, a_fmt, im_fmt, it_fmt, st_fmt), _ = compiled.input_formats
        self._auto = {
            "program": compiled,
            "batch": batch,
            "image_format": im_fmt,
            "var_format": v_fmt,
            "variables": jax.device_put(auto_variables, v_fmt),
            "anchors": jax.device_put(self._anchors_centroids, a_fmt),
            "thr_formats": (it_fmt, st_fmt),
        }
        self._stage_auto_thresholds()

    def _stage_auto_thresholds(self) -> None:
        it_fmt, st_fmt = self._auto["thr_formats"]
        self._auto["iou"] = jax.device_put(self._iou_threshold, it_fmt)
        self._auto["score"] = jax.device_put(self._score_threshold, st_fmt)

    def prepare_input(self, images):
        """Stage an input batch in the serving program's preferred device
        format (input_layout='auto'); host arrays upload directly into the
        chosen tiling.  No-op passthrough when 'auto' is off or the shape
        does not match the compiled batch."""
        if self._auto is not None and images.shape[0] == self._auto["batch"]:
            return jax.device_put(images, self._auto["image_format"])
        return jnp.asarray(images)

    def _auto_call(self, images):
        """Serve through the AUTO-layout executable if it matches this
        input (shape + already-staged format), else return None."""
        if self._auto is None or images.shape[0] != self._auto["batch"]:
            return None
        if getattr(images, "format", None) != self._auto["image_format"]:
            return None
        return self._auto["program"](
            self._auto["variables"],
            self._auto["anchors"],
            images,
            self._auto["iou"],
            self._auto["score"],
        )

    def set_nms_operating_point(
        self,
        boxes_iou_threshold: Optional[float] = None,
        labels_probability_threshold: Optional[float] = None,
    ) -> None:
        """Change the NMS thresholds WITHOUT recompiling — they are traced
        inputs of the serving program.  Grid searches over operating points
        (reference notebook 03 cell 21) run against one compiled
        executable."""
        if boxes_iou_threshold is not None:
            self._iou_threshold = jnp.float32(boxes_iou_threshold)
        if labels_probability_threshold is not None:
            self._score_threshold = jnp.float32(labels_probability_threshold)
        if self._auto is not None:
            self._stage_auto_thresholds()

    def _fused_batch_ok(self, images) -> bool:
        if self._fused_forward is None or self._fused_max_batch is None:
            return True
        if images.shape[0] <= self._fused_max_batch:
            return True
        if not self._fused_fallback_warned:
            import warnings

            warnings.warn(
                f"fused_backbone serving is validated up to batch "
                f"{self._fused_max_batch} in this environment; batch "
                f"{images.shape[0]} falls back to the plain-XLA backbone "
                f"(docs/PERFORMANCE.md 'batch > 16 root cause')",
                stacklevel=3,
            )
            self._fused_fallback_warned = True
        return False

    def _forward(self, variables, images):
        if variables is self.variables:
            out = self._auto_call(images)
            if out is not None:
                return out
        program = (
            self._forward_program
            if self._fused_batch_ok(images)
            else self._fallback_programs[0]
        )
        return program(
            variables,
            self._anchors_centroids,
            images,
            self._iou_threshold,
            self._score_threshold,
        )

    def _pre_nms_fn(self, variables, images):
        program = (
            self._pre_nms_program
            if self._fused_batch_ok(images)
            else self._fallback_programs[1]
        )
        return program(variables, self._anchors_centroids, images)

    def update_variables(self, variables) -> None:
        """Swap in new weights without recompiling the serving program
        (the jitted forward takes variables as an argument).  Used for
        periodic in-training evaluation; not available with
        `fused_backbone=True` (folded weights are baked into the jit)."""
        if self._fused_forward is not None:
            raise ValueError(
                "update_variables is not supported with fused_backbone=True"
            )
        if self._compute_dtype != jnp.float32:
            variables = jax.tree_util.tree_map(
                lambda a: a.astype(self._compute_dtype), variables
            )
        if self.mesh is None:
            self.variables = jax.device_put(variables)
        else:
            from ssdseglib_tpu.parallel import mesh as mesh_lib

            self.variables = mesh_lib.replicate(self.mesh, variables)
        if self._auto is not None:
            # restage into the AUTO executable's chosen weight formats
            self._auto["variables"] = jax.device_put(
                self.variables, self._auto["var_format"]
            )

    def raw_outputs(self, images):
        """Forward + decode + gating WITHOUT the NMS step: returns
        (mask (B,H,W,C), gated labels (B,N,C), decoded boxes_yx (B,N,4)),
        all f32.  Feeds NMS operating-point grid searches (reference
        notebook 03 cells 21-23) without re-running the network."""
        return self._pre_nms_fn(self.variables, self._prepare(images))

    def _prepare(self, images):
        images = jnp.asarray(images)
        if self.mesh is not None:
            from ssdseglib_tpu.parallel import mesh as mesh_lib

            images = mesh_lib.shard_images(self.mesh, images)
        return images

    def __call__(self, images):
        return self._forward(self.variables, self._prepare(images))

    def export_serving_bundle(
        self, path: str, *, batch: int, **kwargs
    ) -> None:
        """Serialize this model's serving program + operands into a
        self-contained AOT deployment bundle (StableHLO via `jax.export`)
        reloadable with `ssdseglib_tpu.export.load_serving_bundle` — the
        TPU-native replacement for the reference's code-shipping
        `model.save` deployment (reference notebook 03 cells 19/25).  See
        `ssdseglib_tpu.export.save_serving_bundle`."""
        from ssdseglib_tpu.export import save_serving_bundle

        save_serving_bundle(self, path, batch=batch, **kwargs)

    def predict(self, images):
        """NumPy-in/NumPy-out convenience, applying the optional host-side
        background-box filter (reference layers.py:165-166).  With
        mask_output='bfloat16' the mask comes back as float32 numpy (the
        on-device/transfer savings are already realized); 'class_map'
        returns the uint8 map."""
        mask, det = self._forward(self.variables, self._prepare(images))
        return self._to_numpy_outputs(mask, det)

    def _to_numpy_outputs(self, mask, det):
        from ssdseglib_tpu.utils.serving import format_outputs

        return format_outputs(mask, det, self._suppress_background)

    def predict_batched(self, images, batch: Optional[int] = None):
        """Serve an arbitrary number of images through ONE compiled
        program, with `predict`'s NumPy output conventions — see
        `utils.serving.predict_batched_chunks` for the chunk /
        repeat-pad / slice protocol and why repeat-padding preserves the
        reference's batch-global segmentation suppression (reference
        layers.py:207) exactly.

        batch: compiled batch size to serve through; defaults to the
        AUTO-layout batch when built with input_layout='auto', else 16
        (the flagship serving batch)."""
        from ssdseglib_tpu.utils.serving import predict_batched_chunks

        if batch is None:
            batch = self._auto["batch"] if self._auto is not None else 16

        def run_chunk(chunk):
            staged = (
                self.prepare_input(chunk)
                if self.mesh is None
                else self._prepare(chunk)
            )
            return self._forward(self.variables, staged)

        mask, det = predict_batched_chunks(images, batch, run_chunk)
        return self._to_numpy_outputs(mask, det)


class _BuilderBase:
    """Shared builder logic mirroring the reference builder ctor surface."""

    def __init__(
        self,
        input_image_shape,
        number_of_boxes_per_point,
        number_of_classes,
        center_x_boxes_default,
        center_y_boxes_default,
        width_boxes_default,
        height_boxes_default,
        standard_deviations_centroids_offsets,
        backbone: str,
        **backbone_kwargs,
    ) -> None:
        if isinstance(number_of_boxes_per_point, int):
            number_of_boxes_per_point = (number_of_boxes_per_point,) * 4
        self.cfg_base = dict(
            input_image_shape=tuple(input_image_shape),
            number_of_classes=number_of_classes,
            boxes_per_point=tuple(number_of_boxes_per_point),
            backbone=backbone,
            **backbone_kwargs,
        )
        self._anchors_centroids = (
            np.asarray(center_x_boxes_default, np.float32),
            np.asarray(center_y_boxes_default, np.float32),
            np.asarray(width_boxes_default, np.float32),
            np.asarray(height_boxes_default, np.float32),
        )
        self._stds = tuple(float(s) for s in standard_deviations_centroids_offsets)
        self._model_cfg: Optional[ModelConfig] = None

    def get_model_for_training(
        self,
        segmentation_architecture: str = "deeplabv3plus",
        object_detection_architecture: str = "ssdlite",
        segmentation_dilation_rates: Tuple[int, int, int] = (6, 12, 18),
    ) -> TrainableModel:
        if segmentation_architecture != "deeplabv3plus":
            raise ValueError("only 'deeplabv3plus' segmentation is available")
        if object_detection_architecture != "ssdlite":
            raise ValueError("only 'ssdlite' object detection is available")
        self._model_cfg = ModelConfig(
            segmentation_dilation_rates=tuple(segmentation_dilation_rates),
            **self.cfg_base,
        )
        module = SsdSegModel(cfg=self._model_cfg)
        return TrainableModel(module=module, cfg=self._model_cfg)

    def get_model_for_inference(
        self,
        model_trained,
        max_number_of_boxes_per_class: int,
        max_number_of_boxes_per_sample: int,
        boxes_iou_threshold: float,
        labels_probability_threshold: float,
        suppress_background_boxes: bool,
        use_segmentation_suppression: bool,
        compute_dtype: str = "float32",
        mesh=None,
        fused_backbone: bool = False,
        mask_output: str = "float32",
        input_layout: str = "default",
        input_layout_batch: int = 16,
        quantize_pointwise: bool = False,
        calibration_images=None,
    ) -> InferenceModel:
        """Args:
            model_trained: the trained variables pytree (params +
                batch_stats), or a (TrainableModel, variables) tuple.
            compute_dtype: 'bfloat16' for the MXU serving fast path.
            mesh: optional Mesh for multi-chip batch-parallel serving.
            fused_backbone: fused Pallas MBConv backbone (mobilenetv2).
            mask_output: 'float32' | 'bfloat16' | 'class_map' serving mask
                format (InferenceModel docstring).
            input_layout / input_layout_batch: 'auto' pre-compiles an
                XLA-chosen-layout executable for one batch shape and kills
                the input relayout copy (InferenceModel docstring).
            quantize_pointwise / calibration_images: opt-in int8 PTQ of
                the two pointwise convs with a measured int8 MXU win
                (fused_inference.QUANT_TARGETS); requires fused_backbone
                and a representative calibration batch in [0, 255].
        """
        if isinstance(model_trained, tuple):
            trainable, variables = model_trained
            module = trainable.module
        else:
            if self._model_cfg is None:
                self.get_model_for_training()
            module = SsdSegModel(cfg=self._model_cfg)
            variables = model_trained

        cx, cy, w, h = self._anchors_centroids
        decode = DecodeBoxesCentroidsOffsets(
            cx, cy, w, h, *self._stds
        )
        nms = NonMaximumSuppression(
            max_number_of_boxes_per_class=max_number_of_boxes_per_class,
            max_number_of_boxes_per_sample=max_number_of_boxes_per_sample,
            boxes_iou_threshold=boxes_iou_threshold,
            labels_probability_threshold=labels_probability_threshold,
            suppress_background_boxes=False,
        )
        return InferenceModel(
            module=module,
            variables=variables,
            decode=decode,
            nms=nms,
            use_segmentation_suppression=use_segmentation_suppression,
            suppress_background_boxes=suppress_background_boxes,
            compute_dtype=compute_dtype,
            mesh=mesh,
            fused_backbone=fused_backbone,
            mask_output=mask_output,
            input_layout=input_layout,
            input_layout_batch=input_layout_batch,
            quantize_pointwise=quantize_pointwise,
            calibration_images=calibration_images,
        )


class MobileNetV2SsdSegBuilder(_BuilderBase):
    """Mirror of reference MobileNetV2SsdSegBuilder (models.py:6-45)."""

    def __init__(
        self,
        input_image_shape,
        number_of_boxes_per_point,
        number_of_classes,
        center_x_boxes_default,
        center_y_boxes_default,
        width_boxes_default,
        height_boxes_default,
        standard_deviations_centroids_offsets,
        **model_kwargs,
    ) -> None:
        """model_kwargs: extra ModelConfig fields beyond the reference ctor
        surface (e.g. detection_head_relu_max=0.0 for uncapped logits)."""
        super().__init__(
            input_image_shape,
            number_of_boxes_per_point,
            number_of_classes,
            center_x_boxes_default,
            center_y_boxes_default,
            width_boxes_default,
            height_boxes_default,
            standard_deviations_centroids_offsets,
            backbone="mobilenetv2",
            **model_kwargs,
        )


class ShuffleNetV2SsdSegBuilder(_BuilderBase):
    """Mirror of reference ShuffleNetV2SsdSegBuilder (models.py:425-478)."""

    def __init__(
        self,
        input_image_shape,
        model_size,
        use_additional_depthwise_convolution,
        use_residual_connections,
        number_of_boxes_per_point,
        number_of_classes,
        center_x_boxes_default,
        center_y_boxes_default,
        width_boxes_default,
        height_boxes_default,
        standard_deviations_centroids_offsets,
        **model_kwargs,
    ) -> None:
        """model_kwargs: extra ModelConfig fields beyond the reference ctor
        surface (e.g. detection_head_relu_max=0.0 for uncapped logits),
        same as MobileNetV2SsdSegBuilder."""
        if model_size not in STAGE_CHANNELS:
            raise ValueError(
                'invalid "model_size" value! available values are '
                '"0.5x", "1x", "1.5x", "2x"'
            )
        super().__init__(
            input_image_shape,
            number_of_boxes_per_point,
            number_of_classes,
            center_x_boxes_default,
            center_y_boxes_default,
            width_boxes_default,
            height_boxes_default,
            standard_deviations_centroids_offsets,
            backbone="shufflenetv2",
            shufflenet_size=model_size,
            shufflenet_extra_depthwise=use_additional_depthwise_convolution,
            shufflenet_residuals=use_residual_connections,
            **model_kwargs,
        )
