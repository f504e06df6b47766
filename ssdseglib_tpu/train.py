"""Training: state, jitted train/eval steps, fit loop.

Replaces the reference's Keras `model.compile(...)` + `model.fit(...)`
recipe (reference notebook 03 cells 14-16) with a functional optax/flax
stack:

- one jitted `train_step` (forward + 3 losses + Adam update + BN stats),
  donated state for in-place buffer reuse on device
- Keras loss semantics: each output's per-sample loss is batch-averaged and
  combined with `loss_weights` (total = sum_i w_i * mean_i)
- optional data parallelism by passing a `Mesh`: batch sharded, params
  replicated, XLA inserts the gradient psum over ICI (see parallel/mesh.py)
- streaming metrics (C20) computed inside the same jitted step
"""

from __future__ import annotations

import dataclasses
import functools
import time
from typing import Any, Callable, Dict, Iterable, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import optax
from flax import struct

from ssdseglib_tpu import losses as losses_lib
from ssdseglib_tpu import metrics as metrics_lib
from ssdseglib_tpu.boxes import Anchors
from ssdseglib_tpu.config import TrainConfig
from ssdseglib_tpu.models.builder import TrainableModel
from ssdseglib_tpu.parallel import mesh as mesh_lib


class TrainState(struct.PyTreeNode):
    """Minimal train state: params + BN stats + optimizer state."""

    step: jnp.ndarray
    params: Any
    batch_stats: Any
    opt_state: Any

    @classmethod
    def create(cls, variables, tx: optax.GradientTransformation) -> "TrainState":
        params = variables["params"]
        return cls(
            step=jnp.zeros((), jnp.int32),
            params=params,
            batch_stats=variables.get("batch_stats", {}),
            opt_state=tx.init(params),
        )

    def variables(self) -> Dict[str, Any]:
        return {"params": self.params, "batch_stats": self.batch_stats}


@dataclasses.dataclass
class Trainer:
    """Compile-once training driver for the joint det+seg objective."""

    model: TrainableModel
    anchors: Anchors
    config: TrainConfig
    # encoding standard deviations used by the decoded-box IoU metric
    # (reference notebook 03 cell 2 STANDARD_DEVIATIONS_CENTROIDS_OFFSETS);
    # must match the EncodingConfig the data pipeline encodes with
    standard_deviations: Tuple[float, float, float, float] = (0.1, 0.1, 0.2, 0.2)

    def __post_init__(self):
        cfg = self.config
        if cfg.streaming_metrics not in ("full", "loss_only"):
            raise ValueError(
                "streaming_metrics must be 'full' or 'loss_only', got "
                f"{cfg.streaming_metrics!r}"
            )
        if cfg.mask_loss == "cross_entropy":
            self._mask_loss = losses_lib.cross_entropy(list(cfg.mask_class_weights))
        elif cfg.mask_loss == "dice":
            self._mask_loss = losses_lib.dice(list(cfg.mask_class_weights))
        elif cfg.mask_loss == "dice_square":
            self._mask_loss = losses_lib.dice_square(list(cfg.mask_class_weights))
        else:
            raise ValueError(f"unknown mask loss {cfg.mask_loss!r}")

        n_classes = self.model.cfg.number_of_classes
        det_weights = [0.0] + [1.0 / (n_classes - 1)] * (n_classes - 1)
        self._mask_iou = metrics_lib.jaccard_iou_segmentation_masks(
            list(cfg.mask_class_weights)
        )
        self._box_iou = metrics_lib.jaccard_iou_bounding_boxes(
            self.anchors, tuple(self.standard_deviations)
        )
        self._cat_acc = metrics_lib.categorical_accuracy(det_weights)

        if cfg.lr_schedule == "constant":
            lr = cfg.learning_rate
        elif cfg.lr_schedule == "warmup_cosine":
            if not cfg.lr_total_steps:
                raise ValueError("warmup_cosine needs lr_total_steps")
            lr = optax.warmup_cosine_decay_schedule(
                init_value=0.0,
                peak_value=cfg.learning_rate,
                warmup_steps=cfg.lr_warmup_steps,
                decay_steps=cfg.lr_total_steps,
                end_value=cfg.lr_final,
            )
        else:
            raise ValueError(f"unknown lr_schedule {cfg.lr_schedule!r}")
        self.tx = optax.adam(lr, mu_dtype=jnp.dtype(cfg.adam_mu_dtype))
        self._train_step = None
        self._eval_step = None
        self._fused_steps = {}

    # -- state ------------------------------------------------------------
    def init_state(self, rng: jax.Array, mesh=None) -> TrainState:
        variables = self.model.init(rng, batch_size=1)
        state = TrainState.create(variables, self.tx)
        if mesh is not None:
            state = mesh_lib.replicate(mesh, state)
        return state

    # -- loss -------------------------------------------------------------
    def _losses_and_metrics(
        self, outputs: Dict[str, jnp.ndarray], targets: Dict[str, jnp.ndarray]
    ) -> Tuple[jnp.ndarray, Dict[str, jnp.ndarray]]:
        cfg = self.config
        l_mask = jnp.mean(
            self._mask_loss(targets["output-mask"], outputs["output-mask"])
        )
        l_conf = jnp.mean(
            losses_lib.confidence_loss(
                targets["output-labels"], outputs["output-labels"],
                negatives_ratio=cfg.hnm_negatives_ratio,
            )
        )
        l_loc = jnp.mean(
            losses_lib.localization_loss(
                targets["output-boxes"], outputs["output-boxes"]
            )
        )
        total = (
            cfg.loss_weight_mask * l_mask
            + cfg.loss_weight_labels * l_conf
            + cfg.loss_weight_boxes * l_loc
        )
        metrics = {
            "loss": total,
            "loss/mask": l_mask,
            "loss/labels": l_conf,
            "loss/boxes": l_loc,
        }
        if cfg.streaming_metrics == "full":
            metrics.update({
                "iou/mask": jnp.mean(
                    self._mask_iou(
                        targets["output-mask"], outputs["output-mask"]
                    )
                ),
                "iou/boxes": jnp.mean(
                    self._box_iou(
                        targets["output-boxes"], outputs["output-boxes"]
                    )
                ),
                "accuracy/labels": jnp.mean(
                    self._cat_acc(
                        targets["output-labels"], outputs["output-labels"]
                    )
                ),
            })
        return total, metrics

    # -- steps ------------------------------------------------------------
    def train_step_fn(self) -> Callable:
        if self._train_step is not None:
            return self._train_step
        module = self.model.module
        tx = self.tx

        compute_dtype = jnp.dtype(self.config.compute_dtype)
        mixed = compute_dtype != jnp.float32

        apply_train = functools.partial(
            module.apply, train=True, mutable=["batch_stats"]
        )
        if self.config.remat:
            # rematerialize the forward in the backward pass instead of
            # storing the full-resolution mask-head activations
            apply_train = jax.checkpoint(apply_train)

        def loss_fn(params, batch_stats, images, targets):
            if mixed:
                # mixed precision: grads flow through the cast back to the
                # f32 master params; losses/metrics and the stored BN
                # statistics stay f32
                apply_vars = {
                    "params": jax.tree_util.tree_map(
                        lambda x: x.astype(compute_dtype), params
                    ),
                    "batch_stats": jax.tree_util.tree_map(
                        lambda x: x.astype(compute_dtype), batch_stats
                    ),
                }
                images = images.astype(compute_dtype)
            else:
                apply_vars = {"params": params, "batch_stats": batch_stats}
            outputs, mutated = apply_train(apply_vars, images)
            outputs = jax.tree_util.tree_map(
                lambda x: x.astype(jnp.float32), outputs
            )
            new_stats = mutated["batch_stats"]
            if mixed:
                new_stats = jax.tree_util.tree_map(
                    lambda x: x.astype(jnp.float32), new_stats
                )
            total, metrics = self._losses_and_metrics(outputs, targets)
            return total, (new_stats, metrics)

        # donate the state: params/opt-state buffers are reused in place for
        # the updated state (no-op on CPU backends, which warn and copy)
        @functools.partial(jax.jit, donate_argnums=(0,))
        def train_step(state: TrainState, images, targets):
            grads, (new_stats, metrics) = jax.grad(loss_fn, has_aux=True)(
                state.params, state.batch_stats, images, targets
            )
            updates, new_opt_state = tx.update(grads, state.opt_state, state.params)
            new_params = optax.apply_updates(state.params, updates)
            new_state = state.replace(
                step=state.step + 1,
                params=new_params,
                batch_stats=new_stats,
                opt_state=new_opt_state,
            )
            return new_state, metrics

        self._train_step = train_step
        return train_step

    def recalibrate_batch_stats(
        self, state: TrainState, batches, max_batches: int = 64
    ) -> TrainState:
        """PreciseBN: replace the EMA batch-norm statistics with the TRUE
        population statistics estimated over training batches.

        The EMA stats a momentum-0.99 BatchNorm accumulates can sit far
        from the population statistics the deployed network actually sees
        (measured on v5e: ~20x more false-positive detections under EMA
        stats than under batch stats — docs/PERFORMANCE.md round-2
        learning study).  Standard practice in detection frameworks
        (PreciseBN); the reference has no equivalent.

        Per-batch statistics are recovered from the flax EMA update
        (batch = (new - m * old) / (1 - m)) so no module changes are
        needed; the population variance is E[var_b + mean_b^2] -
        E[mean_b]^2.

        Args:
            batches: iterable of (images, targets) training batches
                (targets unused); only the first `max_batches` are read.
        """
        from flax.traverse_util import flatten_dict, unflatten_dict

        from ssdseglib_tpu.models.blocks import BN_MOMENTUM

        module = self.model.module

        @jax.jit
        def batch_stats_of(variables, images):
            _, mutated = module.apply(
                variables, images, train=True, mutable=["batch_stats"]
            )
            m = BN_MOMENTUM
            return jax.tree_util.tree_map(
                lambda new, old: (new - m * old) / (1.0 - m),
                mutated["batch_stats"], variables["batch_stats"],
            )

        variables = state.variables()
        acc: Dict = {}
        n = 0
        for item in batches:
            if n >= max_batches:
                break
            images = item[0]
            flat = flatten_dict(
                jax.device_get(batch_stats_of(variables, images))
            )
            for path, value in flat.items():
                kind = path[-1]  # 'mean' or 'var'
                slot = acc.setdefault(path[:-1], {"mean": 0.0, "m2": 0.0})
                if kind == "mean":
                    slot["mean"] = slot["mean"] + value
                    slot["m2"] = slot["m2"] + value * value
                elif kind == "var":
                    slot["m2"] = slot["m2"] + value
            n += 1
        if n == 0:
            return state
        new_flat = {}
        for base, slot in acc.items():
            e_mean = slot["mean"] / n
            e_var = slot["m2"] / n - e_mean * e_mean
            new_flat[base + ("mean",)] = jnp.asarray(e_mean)
            new_flat[base + ("var",)] = jnp.asarray(np.maximum(e_var, 0.0))
        return state.replace(batch_stats=unflatten_dict(new_flat))

    def eval_step_fn(self) -> Callable:
        if self._eval_step is not None:
            return self._eval_step
        module = self.model.module

        @jax.jit
        def eval_step(state: TrainState, images, targets):
            outputs = module.apply(state.variables(), images, train=False)
            _, metrics = self._losses_and_metrics(outputs, targets)
            return metrics

        self._eval_step = eval_step
        return eval_step

    # -- transform-fused steps ---------------------------------------------
    # On remote-attached TPUs every dispatched executable carries fixed
    # host-link overhead; running the data transform (flip/color/one-hot/
    # anchor matching) and the train step as ONE jit program is ~5x faster
    # wall-clock than two dispatches (docs/PERFORMANCE.md).

    def fused_train_step_fn(self, transform: Callable) -> Callable:
        # the cache holds a strong reference to the transform so its id()
        # stays valid for the lifetime of the cached entry (a freed id can
        # be reused by CPython and would alias a different transform)
        key = ("train", id(transform))
        if key in self._fused_steps:
            return self._fused_steps[key][1]
        inner = self.train_step_fn()

        @functools.partial(jax.jit, donate_argnums=(0,))
        def fused(state: TrainState, rng, *raw_batch):
            images, targets = transform(rng, *raw_batch)
            return inner.__wrapped__(state, images, targets)

        self._fused_steps[key] = (transform, fused)
        return fused

    def fused_eval_step_fn(self, transform: Callable) -> Callable:
        key = ("eval", id(transform))
        if key in self._fused_steps:
            return self._fused_steps[key][1]
        inner = self.eval_step_fn()

        @jax.jit
        def fused(state: TrainState, rng, *raw_batch):
            images, targets = transform(rng, *raw_batch)
            return inner.__wrapped__(state, images, targets)

        self._fused_steps[key] = (transform, fused)
        return fused

    # -- loop -------------------------------------------------------------
    def fit(
        self,
        state: TrainState,
        train_data: Iterable,
        epochs: Optional[int] = None,
        validation_data: Optional[Iterable] = None,
        mesh=None,
        checkpointer=None,
        log_fn: Callable[[str], None] = print,
        steps_per_epoch: Optional[int] = None,
        metrics_logger=None,
        resume: bool = False,
    ) -> Tuple[TrainState, Dict[str, list]]:
        """Epoch loop over (images, targets) batches.

        `train_data` / `validation_data` are callables returning a fresh
        iterator per epoch, or re-iterable objects.  With `resume=True` and
        a checkpointer holding a prior step, training restarts from the
        latest checkpoint (the failure-recovery story the reference lacks —
        SURVEY.md §5: a crashed Keras fit loses all 105 epochs).
        """
        epochs = epochs or self.config.epochs
        if resume and checkpointer is not None:
            latest = checkpointer.latest_step()
            if latest is not None:
                state = checkpointer.restore(jax.device_get(state))
                if mesh is not None:
                    # re-establish the replicated sharding: the restored
                    # state is host arrays, and feeding them uncommitted into
                    # a step with mesh-sharded batch inputs leaves placement
                    # to the compiler
                    state = mesh_lib.replicate(mesh, state)
                log_fn(f"resumed from checkpoint step {latest}")

        # loaders exposing their pure transform (TrainDataLoader) get the
        # transform fused into the step: one executable per step
        fuse_train = hasattr(train_data, "iter_raw") and hasattr(
            train_data, "transform"
        )
        fuse_val = validation_data is not None and hasattr(
            validation_data, "iter_raw"
        ) and hasattr(validation_data, "transform")
        if fuse_train:
            fused_train = self.fused_train_step_fn(train_data.transform)
        if fuse_val:
            fused_eval = self.fused_eval_step_fn(validation_data.transform)

        # Chunked host->device staging for fused steps: a device_put issued
        # while compute is queued serializes ~10x on remote-attached TPUs,
        # so drain the queue (fence), bulk-upload a chunk of host batches
        # onto the idle device, then dispatch the chunk's steps
        # back-to-back.  The epoch loops set _stage_fence to their latest
        # metric so the next upload knows what to wait on.
        _stage_fence = [None]

        def _staged(raw_iter, chunk_size: int = 8):
            buf = []

            def upload(chunk):
                if _stage_fence[0] is not None:
                    jax.block_until_ready(_stage_fence[0])
                if mesh is not None:
                    # raw batches lead with the image tensor
                    # (TrainDataLoader.iter_raw: (images_u8, masks_u8,
                    # ...)); images go through shard_images so a hybrid
                    # data x spatial mesh shards the height axis too —
                    # same convention as the non-fused branches below
                    put = lambda b: (
                        mesh_lib.shard_images(mesh, b[0]),
                    ) + tuple(mesh_lib.shard_batch(mesh, a) for a in b[1:])
                else:
                    put = jax.device_put
                return [(k, put(b)) for k, b in chunk]

            for item in raw_iter:
                buf.append(item)
                if len(buf) >= chunk_size:
                    yield from upload(buf)
                    buf = []
            if buf:
                yield from upload(buf)
        train_step = self.train_step_fn()
        eval_step = self.eval_step_fn()
        history: Dict[str, list] = {}

        def _epoch_iter(data):
            return data() if callable(data) else data

        for epoch in range(epochs):
            t0 = time.perf_counter()
            # accumulate metrics ON DEVICE: a float() per step would force a
            # device sync that serializes host decode / transfer / compute
            agg: Dict[str, jnp.ndarray] = {}
            n = 0
            if fuse_train:
                for rng, batch in _staged(train_data.iter_raw()):
                    state, metrics = fused_train(state, rng, *batch)
                    _stage_fence[0] = metrics["loss"]
                    n += 1
                    for k, v in metrics.items():
                        agg[k] = v if k not in agg else agg[k] + v
                    if steps_per_epoch and n >= steps_per_epoch:
                        break
            else:
                for images, targets in _epoch_iter(train_data):
                    if mesh is not None:
                        images = mesh_lib.shard_images(mesh, images)
                        targets = mesh_lib.shard_batch(mesh, targets)
                    state, metrics = train_step(state, images, targets)
                    n += 1
                    for k, v in metrics.items():
                        agg[k] = v if k not in agg else agg[k] + v
                    if steps_per_epoch and n >= steps_per_epoch:
                        break
            for k in agg:
                history.setdefault(k, []).append(float(agg[k]) / max(n, 1))

            if validation_data is not None:
                vagg: Dict[str, jnp.ndarray] = {}
                vn = 0
                if fuse_val:
                    for rng, batch in _staged(validation_data.iter_raw()):
                        metrics = fused_eval(state, rng, *batch)
                        _stage_fence[0] = metrics["loss"]
                        vn += 1
                        for k, v in metrics.items():
                            vagg[k] = v if k not in vagg else vagg[k] + v
                else:
                    for images, targets in _epoch_iter(validation_data):
                        if mesh is not None:
                            images = mesh_lib.shard_images(mesh, images)
                            targets = mesh_lib.shard_batch(mesh, targets)
                        metrics = eval_step(state, images, targets)
                        vn += 1
                        for k, v in metrics.items():
                            vagg[k] = v if k not in vagg else vagg[k] + v
                for k in vagg:
                    history.setdefault(f"val_{k}", []).append(
                        float(vagg[k]) / max(vn, 1)
                    )

            dt = time.perf_counter() - t0
            msg = f"epoch {epoch + 1}/{epochs} [{dt:.1f}s, {n} steps]"
            for k in ("loss", "iou/mask", "iou/boxes"):
                if k in history:
                    msg += f" {k}={history[k][-1]:.4f}"
                if f"val_{k}" in history:
                    msg += f" val_{k}={history[f'val_{k}'][-1]:.4f}"
            log_fn(msg)
            if metrics_logger is not None:
                metrics_logger.log(
                    {k: v[-1] for k, v in history.items()},
                    step=int(np.asarray(state.step)),
                )

            if checkpointer is not None:
                checkpointer.save(int(np.asarray(state.step)), jax.device_get(state))

        if checkpointer is not None and hasattr(
            checkpointer, "wait_until_finished"
        ):
            # saves are queued async (they overlap the next epoch's
            # compute); fence before returning so a process that exits
            # right after fit() cannot lose the final epoch's checkpoint
            # to an in-flight background commit
            checkpointer.wait_until_finished()

        return state, history
