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

    def __post_init__(self):
        cfg = self.config
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
            self.anchors, (0.1, 0.1, 0.2, 0.2)
        )
        self._cat_acc = metrics_lib.categorical_accuracy(det_weights)

        self.tx = optax.adam(cfg.learning_rate)
        self._train_step = None
        self._eval_step = None

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
                targets["output-labels"], outputs["output-labels"]
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
            "iou/mask": jnp.mean(
                self._mask_iou(targets["output-mask"], outputs["output-mask"])
            ),
            "iou/boxes": jnp.mean(
                self._box_iou(targets["output-boxes"], outputs["output-boxes"])
            ),
            "accuracy/labels": jnp.mean(
                self._cat_acc(targets["output-labels"], outputs["output-labels"])
            ),
        }
        return total, metrics

    # -- steps ------------------------------------------------------------
    def train_step_fn(self) -> Callable:
        if self._train_step is not None:
            return self._train_step
        module = self.model.module
        tx = self.tx

        compute_dtype = jnp.dtype(self.config.compute_dtype)
        mixed = compute_dtype != jnp.float32

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
            outputs, mutated = module.apply(
                apply_vars, images, train=True, mutable=["batch_stats"]
            )
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

        @jax.jit
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
                log_fn(f"resumed from checkpoint step {latest}")
        train_step = self.train_step_fn()
        eval_step = self.eval_step_fn()
        history: Dict[str, list] = {}

        def _epoch_iter(data):
            return data() if callable(data) else data

        for epoch in range(epochs):
            t0 = time.perf_counter()
            agg: Dict[str, float] = {}
            n = 0
            for images, targets in _epoch_iter(train_data):
                if mesh is not None:
                    images = mesh_lib.shard_batch(mesh, images)
                    targets = mesh_lib.shard_batch(mesh, targets)
                state, metrics = train_step(state, images, targets)
                n += 1
                for k, v in metrics.items():
                    agg[k] = agg.get(k, 0.0) + float(v)
                if steps_per_epoch and n >= steps_per_epoch:
                    break
            for k in agg:
                history.setdefault(k, []).append(agg[k] / max(n, 1))

            if validation_data is not None:
                vagg: Dict[str, float] = {}
                vn = 0
                for images, targets in _epoch_iter(validation_data):
                    if mesh is not None:
                        images = mesh_lib.shard_batch(mesh, images)
                        targets = mesh_lib.shard_batch(mesh, targets)
                    metrics = eval_step(state, images, targets)
                    vn += 1
                    for k, v in metrics.items():
                        vagg[k] = vagg.get(k, 0.0) + float(v)
                for k in vagg:
                    history.setdefault(f"val_{k}", []).append(vagg[k] / max(vn, 1))

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

        return state, history
