"""Keras-style model facade over the functional JAX trainer.

The reference notebooks drive training through the Keras object API
(reference notebook 03 cells 12-31):

    model = model_builder.get_model_for_training(...)   # cell 12
    model.summary()
    model.compile(optimizer=..., loss={...}, loss_weights={...},
                  metrics={...})                        # cell 14
    history = model.fit(ds_train, epochs=105,
                        validation_data=ds_eval)        # cell 16
    model.save('models/....keras')                      # cell 17
    model_trained = tf.keras.models.load_model(...)     # cell 19
    model_inference = model_builder.get_model_for_inference(
        model_trained=model_trained, ...)               # cells 21/23
    mask, det = model_inference.predict(ds_test)        # cells 21/25
    mask, det = model_inference(image_batch, training=False)  # cell 31

This module provides that exact surface on the TPU-native stack: the
builders subclass `ssdseglib_tpu.models` builders, `get_model_for_training`
returns a `KerasStyleModel` whose `fit` runs the jitted optax train step,
`save` writes a TF-2.13-layout `.keras` zip (with the model config embedded
so `load_model` can rebuild), and `get_model_for_inference` accepts the
facade, a loaded checkpoint, a raw variables pytree, or a genuine Keras
model (weights imported by name via `ssdseglib_tpu.keras_import`).
"""

from __future__ import annotations

import dataclasses
import functools
import json
import os
import sys
import time
import zipfile
from typing import Any, Callable, Dict, Optional

import numpy as np

import ssdseglib_tpu.models as _impl
from ssdseglib_tpu.config import ModelConfig
from ssdseglib_tpu import keras_import
from ssdseglib_tpu.models.builder import TrainableModel, count_parameters

globals().update(
    {k: v for k, v in vars(_impl).items() if not k.startswith("__")}
)

#: test-harness knob: cap `fit(epochs=...)` so the reference notebook's
#: 105-epoch cell (notebook 03 cell 16) can execute verbatim in a bounded
#: CI budget.  Unset = no cap.  When it caps, fit prints a notice.
MAX_EPOCHS_ENV = "SSDSEGLIB_MAX_EPOCHS"

_CONFIG_MEMBER = "ssdseglib_tpu.json"


# -- config (de)serialization ------------------------------------------------

def _tuplify(value):
    if isinstance(value, list):
        return tuple(_tuplify(v) for v in value)
    return value


def _config_to_json(cfg: ModelConfig) -> str:
    return json.dumps(
        {"model_config": dataclasses.asdict(cfg), "format": "ssdseglib-tpu-v1"}
    )


def _config_from_json(text: str) -> ModelConfig:
    payload = json.loads(text)
    fields = {k: _tuplify(v) for k, v in payload["model_config"].items()}
    return ModelConfig(**fields)


# -- dataset iteration -------------------------------------------------------

def _is_tf_dataset(x) -> bool:
    return hasattr(x, "as_numpy_iterator") and hasattr(x, "element_spec")


def _iter_batches(data):
    """Yield numpy batches from a tf.data.Dataset or any (re-)iterable."""
    if _is_tf_dataset(data):
        return data.as_numpy_iterator()
    if callable(data) and not hasattr(data, "__iter__"):
        return iter(data())
    return iter(data)


def _learning_rate_of(optimizer) -> float:
    """Extract a float learning rate from a Keras optimizer (the notebooks
    pass `tf.keras.optimizers.Adam(learning_rate=1e-4)` — notebook 03 cell
    14), a plain float, or None (Keras Adam default)."""
    if optimizer is None:
        return 1e-3
    if isinstance(optimizer, (int, float)):
        return float(optimizer)
    lr = getattr(optimizer, "learning_rate", None)
    if lr is None:
        return 1e-3
    try:
        return float(np.asarray(lr))
    except Exception:
        return float(lr.numpy())


class History:
    """Minimal `keras.callbacks.History` stand-in (`.history`, `.epoch`)."""

    def __init__(self) -> None:
        self.history: Dict[str, list] = {}
        self.epoch: list = []


# -- fast fit machinery --------------------------------------------------------
#
# The facade consumes arbitrary host pipelines (the notebooks pass tf.data
# datasets — reference notebook 03 cell 8), so Trainer.fit's fused
# on-device transform does not apply; instead the same three levers are
# rebuilt for host batches (VERDICT r3 item 3):
#   1. exact uint8 packing: the dominant upload is the one-hot f32 mask
#      target (B,480,640,C) = 78 MB at batch 16; exactly-one-hot targets
#      pack to a uint8 class map (16x smaller) and are re-one-hot on
#      device INSIDE the jitted step — bit-exact, because the reference
#      encoder emits {0,1} one-hot (reference datacoder.py:247-248, :333)
#   2. a producer thread so host decode/encode (tf.data numpy_function)
#      and packing overlap device compute
#   3. fenced chunk staging: a device_put issued while compute is queued
#      serializes ~10x on remote-attached TPUs (same pattern as
#      ssdseglib_tpu.train.Trainer.fit's _staged)

_TARGET_KEYS = ("output-mask", "output-labels", "output-boxes")


def _exactly_one_hot(arr) -> bool:
    """True iff `arr` is an exact {0,1} float32 one-hot over its last axis
    (sum==1 and max==1 over the last axis forces every entry into {0,1})."""
    arr = np.asarray(arr)
    if arr.dtype != np.float32 or arr.ndim < 2 or arr.size == 0:
        return False
    return bool(
        arr.min() >= 0.0
        and (arr.max(axis=-1) == 1.0).all()
        and (arr.sum(axis=-1) == 1.0).all()
    )


def _pack_host_batch(images, targets):
    """Pack one host batch for upload; returns (kind, flat_tuple)."""
    mask = np.asarray(targets["output-mask"])
    labels = np.asarray(targets["output-labels"])
    boxes = np.asarray(targets["output-boxes"], np.float32)
    images = np.asarray(images, np.float32)
    if _exactly_one_hot(mask) and _exactly_one_hot(labels):
        return "packed", (
            images,
            mask.argmax(-1).astype(np.uint8),
            labels.argmax(-1).astype(np.uint8),
            boxes,
        )
    return "plain", (images, mask, labels, boxes)


class _Prefetcher:
    """Producer thread: pulls + packs host batches ahead of the dispatch
    loop.  Exceptions propagate to the consumer; `close()` stops early."""

    _DONE = object()

    def __init__(self, batches, depth: int = 3) -> None:
        import queue
        import threading

        self._q: Any = queue.Queue(maxsize=depth)
        self._stop = threading.Event()

        def produce():
            try:
                for images, targets in batches:
                    if self._stop.is_set():
                        break
                    item = _pack_host_batch(images, targets)
                    while not self._stop.is_set():
                        try:
                            self._q.put(item, timeout=0.5)
                            break
                        except queue.Full:
                            continue
            except BaseException as exc:  # relay to consumer
                self._q.put(exc)
            else:
                self._q.put(self._DONE)

        self._thread = threading.Thread(target=produce, daemon=True)
        self._thread.start()

    def __iter__(self):
        while True:
            item = self._q.get()
            if item is self._DONE:
                return
            if isinstance(item, BaseException):
                raise item
            yield item

    def close(self) -> None:
        self._stop.set()


def _staged_batches(data, fence, chunk_size: int = 4):
    """Yield (kind, device_batch) with prefetch + fenced chunk uploads.

    `fence` is a one-element list the dispatch loop sets to its latest
    on-device metric; each chunk upload first drains the compute queue by
    blocking on it, then bulk-uploads onto the idle device.
    """
    import jax

    prefetcher = _Prefetcher(_zip_batches(data))
    try:
        buf = []

        def upload(chunk):
            if fence[0] is not None:
                jax.block_until_ready(fence[0])
            return [
                (kind, tuple(jax.device_put(a) for a in flat))
                for kind, flat in chunk
            ]

        for item in prefetcher:
            buf.append(item)
            if len(buf) >= chunk_size:
                yield from upload(buf)
                buf = []
        if buf:
            yield from upload(buf)
    finally:
        prefetcher.close()


def _zip_batches(data):
    for batch in _iter_batches(data):
        if isinstance(batch, (tuple, list)) and len(batch) == 2:
            yield batch[0], batch[1]
        else:
            raise ValueError(
                "fit/evaluate expect (images, targets-dict) batches"
            )


class KerasStyleModel:
    """compile/fit/predict/save facade over `TrainableModel` + optax.

    One jitted train step (forward + compiled losses/metrics + Adam update
    + BN stats, state donated for in-place buffer reuse); metrics are
    aggregated on device and synced once per epoch.
    """

    def __init__(self, trainable: TrainableModel, name: str = "ssdseg") -> None:
        self._trainable = trainable
        self.module = trainable.module
        self.cfg = trainable.cfg
        self.name = name
        self._variables = None
        self._compiled: Optional[Dict[str, Any]] = None
        self._state = None  # TrainState, persists across fit calls
        self._steps = None  # (train_step, eval_step)

    # -- variables -------------------------------------------------------
    @property
    def variables(self):
        """The Flax variables pytree (params + batch_stats); lazily
        initialized with the reference seed (notebook 03 cell 2).

        Initialization runs on the CPU backend when one is available: the
        flax init program is single-use, and on a remote-attached TPU its
        compile costs minutes for zero reuse; parameters transfer to the
        accelerator on first real use anyway."""
        if self._variables is None:
            import contextlib

            import jax

            try:
                scope = jax.default_device(jax.local_devices(backend="cpu")[0])
            except RuntimeError:
                scope = contextlib.nullcontext()
            with scope:
                self._variables = self._trainable.init(jax.random.key(1993))
        return self._variables

    def set_variables(self, variables) -> None:
        self._variables = variables
        self._state = None  # stale optimizer state refers to old params

    # -- keras-surface ---------------------------------------------------
    def summary(self, print_fn: Callable[[str], None] = print) -> None:
        trainable, stats = count_parameters(self.variables)
        print_fn(f'Model: "{self.name}"')
        shape = (None,) + tuple(self.cfg.input_image_shape)
        print_fn(f"  input: {shape}")
        n = sum(
            h * w * b
            for (h, w), b in zip(
                self._head_feature_shapes(), self.cfg.boxes_per_point
            )
        )
        # labels get 4 channels and boxes get number_of_classes — the
        # reference's preserved head channel-swap quirk (reference
        # models.py:250-268; equal only because num_classes == 4 in the
        # published config)
        print_fn(
            f"  outputs: output-mask (None, {shape[1]}, {shape[2]}, "
            f"{self.cfg.number_of_classes}), output-labels (None, {n}, 4), "
            f"output-boxes (None, {n}, {self.cfg.number_of_classes})"
        )
        print_fn("=" * 65)
        print_fn(f"Total params: {trainable + stats:,}")
        print_fn(f"Trainable params: {trainable:,}")
        print_fn(f"Non-trainable params: {stats:,}")

    def _head_feature_shapes(self):
        # detection pyramid: os16 tap, os32 tap, then two stride-2 SAME
        # blocks (out = ceil(in / 2)) — reference models.py:229-244
        def ceil2(a):
            return -(-a // 2)

        h, w = self.cfg.input_image_shape[:2]
        fm1 = (h // 16, w // 16)
        fm2 = (h // 32, w // 32)
        fm3 = (ceil2(fm2[0]), ceil2(fm2[1]))
        fm4 = (ceil2(fm3[0]), ceil2(fm3[1]))
        return [fm1, fm2, fm3, fm4]

    def count_params(self) -> int:
        trainable, stats = count_parameters(self.variables)
        return trainable + stats

    def compile(
        self,
        optimizer=None,
        loss: Optional[Dict[str, Callable]] = None,
        loss_weights: Optional[Dict[str, float]] = None,
        metrics: Optional[Dict[str, Callable]] = None,
        **_ignored,
    ) -> None:
        """Record the training objective (reference notebook 03 cell 14).

        `loss` / `metrics` values are `(y_true, y_pred) -> (B,)` callables —
        the `ssdseglib.losses` / `ssdseglib.metrics` factories are jnp
        functions, so they run inside the jitted step directly.
        """
        import optax

        if not loss:
            raise ValueError("compile() needs a loss dict keyed by output name")
        self._compiled = {
            "loss": dict(loss),
            "loss_weights": dict(loss_weights or {}),
            "metrics": dict(metrics or {}),
            "tx": optax.adam(_learning_rate_of(optimizer)),
        }
        self._state = None
        self._steps = None

    # -- jitted steps ----------------------------------------------------
    def _build_steps(self, kind: str = "plain"):
        """(train_step, eval_step) over a flat (images, mask, labels,
        boxes) batch.  kind='packed' takes uint8 class-map mask/labels and
        re-one-hots them ON DEVICE inside the same jitted program — fused
        by XLA, and 16x less host->device mask traffic than f32 one-hot."""
        if self._steps is None:
            self._steps = {}
        if kind in self._steps:
            return self._steps[kind]
        if self._compiled is None:
            raise RuntimeError("call compile(...) before fit/evaluate")
        import jax
        import jax.numpy as jnp
        import optax

        module = self.module
        losses = self._compiled["loss"]
        weights = self._compiled["loss_weights"]
        metric_fns = self._compiled["metrics"]
        tx = self._compiled["tx"]
        num_classes = self.cfg.number_of_classes

        def unflatten_targets(mask, labels, boxes):
            if kind == "packed":
                mask = jax.nn.one_hot(mask, num_classes, dtype=jnp.float32)
                labels = jax.nn.one_hot(labels, num_classes, dtype=jnp.float32)
            return {
                "output-mask": mask,
                "output-labels": labels,
                "output-boxes": boxes,
            }

        def losses_and_logs(outputs, targets):
            logs = {}
            total = jnp.zeros((), jnp.float32)
            for name, fn in losses.items():
                value = jnp.mean(fn(targets[name], outputs[name]))
                total = total + float(weights.get(name, 1.0)) * value
                logs[f"{name}_loss"] = value
            logs["loss"] = total
            for name, fn in metric_fns.items():
                label = getattr(fn, "__name__", "metric")
                logs[f"{name}_{label}"] = jnp.mean(
                    fn(targets[name], outputs[name])
                )
            return total, logs

        def loss_fn(params, batch_stats, images, targets):
            outputs, mutated = module.apply(
                {"params": params, "batch_stats": batch_stats},
                images,
                train=True,
                mutable=["batch_stats"],
            )
            total, logs = losses_and_logs(outputs, targets)
            return total, (mutated["batch_stats"], logs)

        @functools.partial(jax.jit, donate_argnums=(0,))
        def train_step(state, images, mask, labels, boxes):
            targets = unflatten_targets(mask, labels, boxes)
            grads, (new_stats, logs) = jax.grad(loss_fn, has_aux=True)(
                state.params, state.batch_stats, images, targets
            )
            updates, new_opt_state = tx.update(
                grads, state.opt_state, state.params
            )
            new_params = optax.apply_updates(state.params, updates)
            return (
                state.replace(
                    step=state.step + 1,
                    params=new_params,
                    batch_stats=new_stats,
                    opt_state=new_opt_state,
                ),
                logs,
            )

        @jax.jit
        def eval_step(state, images, mask, labels, boxes):
            targets = unflatten_targets(mask, labels, boxes)
            outputs = module.apply(
                {"params": state.params, "batch_stats": state.batch_stats},
                images,
                train=False,
            )
            return losses_and_logs(outputs, targets)[1]

        self._steps[kind] = (train_step, eval_step)
        return self._steps[kind]

    def _ensure_state(self):
        if self._state is None:
            from ssdseglib_tpu.train import TrainState

            self._state = TrainState.create(
                self.variables, self._compiled["tx"]
            )
        return self._state

    # -- training loop ---------------------------------------------------
    def fit(
        self,
        x=None,
        epochs: int = 1,
        verbose="auto",
        validation_data=None,
        callbacks=None,
        steps_per_epoch: Optional[int] = None,
        **_ignored,
    ) -> History:
        """Keras-style epoch loop (reference notebook 03 cell 16).

        `x` / `validation_data`: a tf.data.Dataset yielding
        ``(images, {'output-mask', 'output-labels', 'output-boxes'})``
        batches (the notebook pipeline), or any re-iterable of such pairs.
        """
        import jax

        cap = os.environ.get(MAX_EPOCHS_ENV)
        if cap is not None and epochs > int(cap):
            print(
                f"[ssdseglib compat] {MAX_EPOCHS_ENV}={cap} caps "
                f"fit(epochs={epochs}) for the test harness"
            )
            epochs = int(cap)

        state = self._ensure_state()
        history = History()
        # on-device metric fence shared by the staged uploader: each chunk
        # upload drains the compute queue before issuing device_puts
        fence = [None]

        for epoch in range(epochs):
            t0 = time.perf_counter()
            # accumulate metrics ON DEVICE; float() once per epoch
            agg: Dict[str, Any] = {}
            n = 0
            for kind, batch in _staged_batches(x, fence):
                train_step, _ = self._build_steps(kind)
                state, logs = train_step(state, *batch)
                fence[0] = logs["loss"]
                n += 1
                for k, v in logs.items():
                    agg[k] = v if k not in agg else agg[k] + v
                if steps_per_epoch and n >= steps_per_epoch:
                    break
            for k in agg:
                history.history.setdefault(k, []).append(
                    float(agg[k]) / max(n, 1)
                )

            if validation_data is not None:
                vagg: Dict[str, Any] = {}
                vn = 0
                for kind, batch in _staged_batches(validation_data, fence):
                    _, eval_step = self._build_steps(kind)
                    logs = eval_step(state, *batch)
                    fence[0] = logs["loss"]
                    vn += 1
                    for k, v in logs.items():
                        vagg[k] = v if k not in vagg else vagg[k] + v
                for k in vagg:
                    history.history.setdefault(f"val_{k}", []).append(
                        float(vagg[k]) / max(vn, 1)
                    )

            history.epoch.append(epoch)
            if verbose not in (0, "0"):
                dt = time.perf_counter() - t0
                line = f"epoch {epoch + 1}/{epochs} [{dt:.1f}s, {n} steps]"
                for k in ("loss", "val_loss"):
                    if k in history.history:
                        line += f" {k}={history.history[k][-1]:.4f}"
                print(line)

        self._state = state
        self._variables = {
            "params": state.params,
            "batch_stats": state.batch_stats,
        }
        return history

    def evaluate(self, x=None, verbose="auto", return_dict: bool = True, **_):
        state = self._ensure_state()
        agg: Dict[str, Any] = {}
        n = 0
        fence = [None]
        for kind, batch in _staged_batches(x, fence):
            _, eval_step = self._build_steps(kind)
            logs = eval_step(state, *batch)
            fence[0] = logs["loss"]
            n += 1
            for k, v in logs.items():
                agg[k] = v if k not in agg else agg[k] + v
        out = {k: float(v) / max(n, 1) for k, v in agg.items()}
        return out if return_dict else [out.get("loss", 0.0)]

    def predict(self, x, verbose="auto", **_):
        """Raw training-graph outputs as [mask, labels, boxes] (the
        reference model's output order, reference models.py:338)."""
        import jax

        outs = {"output-mask": [], "output-labels": [], "output-boxes": []}
        forward = jax.jit(
            lambda variables, images: self.module.apply(
                variables, images, train=False
            )
        )
        for batch in _iter_batches(x):
            images = batch[0] if isinstance(batch, (tuple, list)) else batch
            result = forward(self.variables, images)
            for k in outs:
                outs[k].append(np.asarray(result[k]))
        return [np.concatenate(outs[k], axis=0) for k in outs]

    def __call__(self, images, training: bool = False):
        out = self._trainable.apply(
            self.variables, np.asarray(images, np.float32), train=False
        )
        return [
            np.asarray(out[k])
            for k in ("output-mask", "output-labels", "output-boxes")
        ]

    # -- persistence -----------------------------------------------------
    def save(self, filepath) -> None:
        """Save weights (+ config) — `.keras` writes the TF-2.13 zip layout
        (reference notebook 03 cell 17), anything else a flat `.npz`."""
        import jax

        filepath = str(filepath)
        parent = os.path.dirname(filepath)
        if parent:
            os.makedirs(parent, exist_ok=True)
        variables = jax.device_get(self.variables)
        if filepath.endswith(".keras"):
            keras_import.save_keras_file(
                filepath,
                keras_import.export_keras_weights(variables, self.cfg),
                extra_files={_CONFIG_MEMBER: _config_to_json(self.cfg)},
            )
        else:
            from ssdseglib_tpu.checkpoint import save_params_npz

            save_params_npz(filepath, variables)


class CompatInferenceModel:
    """Reference inference-model surface over `InferenceModel`
    (reference models.py:345-423 and notebook 03 cells 21/25/31):
    callable with `training=`, `predict` over a tf.data.Dataset."""

    def __init__(self, inner, suppress_background_boxes: bool) -> None:
        self._inner = inner
        self._suppress_background = suppress_background_boxes

    def __call__(self, images, training: bool = False):
        mask, detections = self._inner(np.asarray(images, np.float32))
        mask, detections = np.asarray(mask), np.asarray(detections)
        if self._suppress_background:
            # reference behavior: the NMS layer removes background rows
            # INSIDE its call, flattening the batch structure (reference
            # layers.py:165-166) — direct calls must match predict()
            detections = detections[detections[..., 0] > 0.0]
        return mask, detections

    def predict(self, x, verbose="auto", **_):
        """Predict over a dataset/array; returns ``(mask_batch,
        detection_batch)`` stacked across all batches like Keras
        `Model.predict` (reference notebook 03 cell 25)."""
        masks, dets = [], []
        if isinstance(x, np.ndarray) or (
            hasattr(x, "shape") and not _is_tf_dataset(x)
        ):
            batches = [np.asarray(x)]
        else:
            batches = _iter_batches(x)
        for batch in batches:
            images = batch[0] if isinstance(batch, (tuple, list)) else batch
            mask, det = self(images)
            masks.append(mask)
            dets.append(det)
        mask = np.concatenate(masks, axis=0)
        det = np.concatenate(dets, axis=0)
        if self._suppress_background:
            # reference behavior: background-row removal drops the batch
            # structure (reference layers.py:165-166)
            det = det[det[..., 0] > 0.0]
        return mask, det

    def raw_outputs(self, images):
        return self._inner.raw_outputs(images)


def _resolve_variables(model_trained, builder) -> Any:
    """Accept the facade, a loaded checkpoint object, a genuine Keras
    model, or a raw variables pytree; return a variables pytree."""
    if isinstance(model_trained, KerasStyleModel):
        return model_trained.variables
    if hasattr(model_trained, "layers") and hasattr(
        model_trained, "get_weights"
    ):
        # a live (TF) Keras model: import weights by layer name
        cfg = builder._model_cfg
        if cfg is None:
            # build the default config the reference ctor surface implies
            from ssdseglib_tpu.models.builder import _BuilderBase

            _BuilderBase.get_model_for_training(builder)
            cfg = builder._model_cfg
        return keras_import.import_keras_weights(
            keras_import.weights_by_layer_from_keras_model(model_trained), cfg
        )
    return model_trained


class _CompatBuilderMixin:
    """Builder overrides returning the Keras-style facade objects."""

    _facade_name = "ssdseg"

    def get_model_for_training(self, *args, **kwargs) -> KerasStyleModel:
        trainable = super().get_model_for_training(*args, **kwargs)
        return KerasStyleModel(trainable, name=self._facade_name)

    def get_model_for_inference(self, model_trained, *args, **kwargs):
        variables = _resolve_variables(model_trained, self)
        inner = super().get_model_for_inference(variables, *args, **kwargs)
        suppress = kwargs.get("suppress_background_boxes")
        if suppress is None and len(args) >= 5:
            suppress = args[4]
        return CompatInferenceModel(
            inner, suppress_background_boxes=bool(suppress)
        )


class MobileNetV2SsdSegBuilder(
    _CompatBuilderMixin, _impl.MobileNetV2SsdSegBuilder
):
    """Reference `MobileNetV2SsdSegBuilder` (reference models.py:6-45) with
    Keras-style return objects."""

    _facade_name = "mobilenetv2-deeplabv3plus-ssdlite"


class ShuffleNetV2SsdSegBuilder(
    _CompatBuilderMixin, _impl.ShuffleNetV2SsdSegBuilder
):
    """Reference `ShuffleNetV2SsdSegBuilder` (reference models.py:425-478)
    with Keras-style return objects."""

    _facade_name = "shufflenetv2-deeplabv3plus-ssdlite"


# -- load path ---------------------------------------------------------------

def is_ssdseglib_tpu_file(filepath) -> bool:
    """True if `filepath` is a `.keras` zip written by this backend."""
    try:
        with zipfile.ZipFile(str(filepath)) as zf:
            return _CONFIG_MEMBER in zf.namelist()
    except (OSError, zipfile.BadZipFile, IsADirectoryError):
        return False


def load_model(filepath, compile: bool = False, **_ignored) -> KerasStyleModel:
    """Load a `.keras` checkpoint written by `KerasStyleModel.save` back
    into the facade (reference notebook 03 cell 19 recipe)."""
    from ssdseglib_tpu.models.builder import SsdSegModel

    filepath = str(filepath)
    with zipfile.ZipFile(filepath) as zf:
        cfg = _config_from_json(zf.read(_CONFIG_MEMBER).decode())
    variables = keras_import.import_keras_weights(
        keras_import.load_keras_file(filepath), cfg
    )
    trainable = TrainableModel(module=SsdSegModel(cfg=cfg), cfg=cfg)
    model = KerasStyleModel(trainable, name=os.path.basename(filepath))
    model.set_variables(variables)
    return model


def install_tf_load_model_shim() -> None:
    """Wrap `tf.keras.models.load_model` so `.keras` files written by this
    backend load back as `KerasStyleModel` (reference notebook 03 cell 19
    calls the TF loader directly).  Foreign files pass through untouched.
    Only installs if TensorFlow is already imported; idempotent."""
    tf = sys.modules.get("tensorflow")
    if tf is None:
        return
    try:
        original = tf.keras.models.load_model
    except AttributeError:
        return
    if getattr(original, "_ssdseglib_shim", False):
        return

    @functools.wraps(original)
    def load_model_shim(filepath, *args, **kwargs):
        if is_ssdseglib_tpu_file(filepath):
            return load_model(filepath, compile=kwargs.get("compile", False))
        return original(filepath, *args, **kwargs)

    load_model_shim._ssdseglib_shim = True
    tf.keras.models.load_model = load_model_shim


del _impl
