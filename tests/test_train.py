"""Training-stack tests: overfit, data parallelism, pipeline, checkpoints."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ssdseglib_tpu.boxes import Anchors
from ssdseglib_tpu.config import (
    AnchorsConfig,
    EncodingConfig,
    ModelConfig,
    TrainConfig,
)
from ssdseglib_tpu.data.pipeline import TrainDataLoader
from ssdseglib_tpu.data.synthetic import generate_dataset
from ssdseglib_tpu.models.builder import SsdSegModel, TrainableModel
from ssdseglib_tpu.parallel import mesh as mesh_lib
from ssdseglib_tpu.train import Trainer

IMAGE_SHAPE = (96, 128)

ANCHORS_CFG = AnchorsConfig(
    feature_maps_shapes=((6, 8), (3, 4), (2, 2), (1, 1)),
    feature_maps_aspect_ratios=((1.0, 2.0, 0.5),) * 4,
    boxes_scales=(0.2, 0.9),
    centers_padding_from_borders=(0.05, 0.05, 0.05, 0.05),
    additional_square_box=True,
)

MODEL_CFG = ModelConfig(
    input_image_shape=(96, 128, 3),
    number_of_classes=4,
    boxes_per_point=(4, 4, 4, 4),
    backbone="mobilenetv2",
    segmentation_dilation_rates=(3, 6, 12),
)

ENC_CFG = EncodingConfig(
    num_classes=4,
    image_shape=IMAGE_SHAPE,
    iou_threshold=0.35,
    max_ground_truth_boxes=16,
)

TRAIN_CFG = TrainConfig(batch_size=8, learning_rate=3e-4, epochs=1)


@pytest.fixture(scope="module")
def anchors():
    return Anchors.from_config(ANCHORS_CFG, IMAGE_SHAPE)


@pytest.fixture(scope="module")
def trainer(anchors):
    model = TrainableModel(module=SsdSegModel(cfg=MODEL_CFG), cfg=MODEL_CFG)
    return Trainer(model=model, anchors=anchors, config=TRAIN_CFG)


@pytest.fixture(scope="module")
def loader(anchors):
    samples = generate_dataset(8, image_shape=IMAGE_SHAPE, seed=3)
    return TrainDataLoader(
        samples,
        anchors,
        ENC_CFG,
        batch_size=8,
        augmentation_horizontal_flip=False,
        augmentation_rgb=False,
        shuffle=False,
    )


def test_pipeline_shapes(loader):
    images, targets = next(iter(loader))
    assert images.shape == (8, 96, 128, 3)
    assert images.dtype == jnp.float32
    assert targets["output-mask"].shape == (8, 96, 128, 4)
    n_boxes = (6 * 8 + 3 * 4 + 2 * 2 + 1 * 1) * 4
    assert targets["output-labels"].shape == (8, n_boxes, 4)
    assert targets["output-boxes"].shape == (8, n_boxes, 4)
    # synthetic scenes have objects: some positives must be encoded
    positives = float(jnp.sum(1.0 - targets["output-labels"][..., 0]))
    assert positives > 0


def test_overfit_one_batch(trainer, loader):
    """The canonical end-to-end integration check (SURVEY.md §4c): the full
    train step must drive the joint loss sharply down on one batch."""
    images, targets = next(iter(loader))
    state = trainer.init_state(jax.random.key(0))
    step = trainer.train_step_fn()

    state, first = step(state, images, targets)
    losses = [float(first["loss"])]
    for _ in range(60):
        state, metrics = step(state, images, targets)
        losses.append(float(metrics["loss"]))

    assert np.isfinite(losses).all()
    assert losses[-1] < losses[0] * 0.5, losses[::10]
    # both task losses improve
    assert float(metrics["loss/mask"]) < float(first["loss/mask"])
    assert float(metrics["loss/labels"]) < float(first["loss/labels"])


def test_data_parallel_matches_single_device(trainer, loader):
    """One step on an 8-device batch-sharded mesh must match the
    single-device step numerically (XLA inserts the psum; global-batch BN
    keeps semantics identical)."""
    assert jax.device_count() >= 8, "conftest should force 8 virtual devices"
    images, targets = next(iter(loader))
    step = trainer.train_step_fn()

    state1 = trainer.init_state(jax.random.key(0))
    _, metrics_single = step(state1, images, targets)

    mesh = mesh_lib.make_mesh(jax.devices()[:8])
    state8 = trainer.init_state(jax.random.key(0), mesh=mesh)
    images8 = mesh_lib.shard_batch(mesh, images)
    targets8 = mesh_lib.shard_batch(mesh, targets)
    new_state8, metrics_sharded = step(state8, images8, targets8)

    for k in metrics_single:
        np.testing.assert_allclose(
            float(metrics_sharded[k]), float(metrics_single[k]),
            rtol=2e-3, atol=2e-4, err_msg=k,
        )
    # params stay replicated-consistent after the update
    leaf = jax.tree_util.tree_leaves(new_state8.params)[0]
    assert np.all(np.isfinite(np.asarray(leaf)))


def test_fit_loop_and_history(trainer, loader):
    state = trainer.init_state(jax.random.key(1))
    state, history = trainer.fit(
        state, loader, epochs=2, log_fn=lambda s: None
    )
    assert len(history["loss"]) == 2
    assert int(np.asarray(state.step)) == 2 * len(loader)


def test_checkpoint_roundtrip(tmp_path, trainer, loader):
    from ssdseglib_tpu.checkpoint import Checkpointer

    images, targets = next(iter(loader))
    state = trainer.init_state(jax.random.key(2))
    step = trainer.train_step_fn()
    state, _ = step(state, images, targets)

    ckpt = Checkpointer(str(tmp_path / "ckpt"))
    ckpt.save(1, jax.device_get(state))

    template = jax.device_get(trainer.init_state(jax.random.key(3)))
    restored = ckpt.restore(template)
    ckpt.close()

    for a, b in zip(
        jax.tree_util.tree_leaves(restored.params),
        jax.tree_util.tree_leaves(state.params),
    ):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    assert int(np.asarray(restored.step)) == 1


def test_params_npz_roundtrip(tmp_path, trainer):
    from ssdseglib_tpu.checkpoint import load_params_npz, save_params_npz

    state = trainer.init_state(jax.random.key(4))
    variables = jax.device_get(state.variables())
    path = str(tmp_path / "params.npz")
    save_params_npz(path, variables)
    restored = load_params_npz(path, variables)
    for a, b in zip(
        jax.tree_util.tree_leaves(restored), jax.tree_util.tree_leaves(variables)
    ):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_recalibrate_batch_stats(trainer, loader):
    """PreciseBN moment math: with one repeated batch the recalibrated
    statistics equal that batch's own statistics; they differ from the
    near-initialization EMA stats."""
    images, targets = next(iter(loader))
    state = trainer.init_state(jax.random.key(7))
    step = trainer.train_step_fn()
    state, _ = step(state, images, targets)

    recal = trainer.recalibrate_batch_stats(
        state, [(images, targets)] * 3, max_batches=3
    )
    # expected: the exact batch statistics recovered from one EMA update
    from ssdseglib_tpu.models.blocks import BN_MOMENTUM

    _, mutated = trainer.model.module.apply(
        state.variables(), images, train=True, mutable=["batch_stats"]
    )
    expected = jax.tree_util.tree_map(
        lambda new, old: (new - BN_MOMENTUM * old) / (1.0 - BN_MOMENTUM),
        mutated["batch_stats"], state.batch_stats,
    )
    for a, b in zip(
        jax.tree_util.tree_leaves(recal.batch_stats),
        jax.tree_util.tree_leaves(expected),
    ):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=1e-4, atol=1e-5
        )
    # and they moved away from the EMA stats
    diffs = [
        float(np.max(np.abs(np.asarray(a) - np.asarray(b))))
        for a, b in zip(
            jax.tree_util.tree_leaves(recal.batch_stats),
            jax.tree_util.tree_leaves(state.batch_stats),
        )
    ]
    assert max(diffs) > 1e-3


def test_warmup_cosine_schedule(anchors, loader):
    """lr_schedule='warmup_cosine' builds and steps; a missing
    lr_total_steps is rejected."""
    import dataclasses

    cfg = dataclasses.replace(
        TRAIN_CFG, lr_schedule="warmup_cosine", lr_warmup_steps=2,
        lr_total_steps=10, lr_final=1e-6,
    )
    model = TrainableModel(module=SsdSegModel(cfg=MODEL_CFG), cfg=MODEL_CFG)
    tr = Trainer(model=model, anchors=anchors, config=cfg)
    state = tr.init_state(jax.random.key(6))
    step = tr.train_step_fn()
    images, targets = next(iter(loader))
    s1, m1 = step(state, images, targets)
    _, m2 = step(s1, images, targets)
    assert np.isfinite(float(m1["loss"])) and np.isfinite(float(m2["loss"]))

    bad = dataclasses.replace(TRAIN_CFG, lr_schedule="warmup_cosine")
    with pytest.raises(ValueError):
        Trainer(model=model, anchors=anchors, config=bad)


def test_bf16_mu_and_remat_train_step(anchors, loader):
    """Optimizer-state bf16 first moment + rematerialized forward: the
    step must run, store mu in bf16, and still drive the loss down."""
    import dataclasses

    cfg = dataclasses.replace(
        TRAIN_CFG,
        compute_dtype="bfloat16",
        adam_mu_dtype="bfloat16",
        remat=True,
    )
    model = TrainableModel(module=SsdSegModel(cfg=MODEL_CFG), cfg=MODEL_CFG)
    tr = Trainer(model=model, anchors=anchors, config=cfg)
    state = tr.init_state(jax.random.key(5))
    mu_leaf = jax.tree_util.tree_leaves(state.opt_state[0].mu)[0]
    assert mu_leaf.dtype == jnp.bfloat16
    nu_leaf = jax.tree_util.tree_leaves(state.opt_state[0].nu)[0]
    assert nu_leaf.dtype == jnp.float32

    step = tr.train_step_fn()
    images, targets = next(iter(loader))
    state, m1 = step(state, images, targets)
    for _ in range(10):
        state, m2 = step(state, images, targets)
    assert np.isfinite(float(m2["loss"]))
    assert float(m2["loss"]) < float(m1["loss"])


def test_loss_only_streaming_metrics(anchors, loader):
    """streaming_metrics='loss_only' drops the per-step metric ops but
    keeps the exact same losses/updates ('full' stays the reference
    default — notebook 03 cell 14 compiles metrics on every output)."""
    import dataclasses

    images, targets = next(iter(loader))
    metrics_by_mode = {}
    for mode in ("full", "loss_only"):
        cfg = dataclasses.replace(TRAIN_CFG, streaming_metrics=mode)
        model = TrainableModel(module=SsdSegModel(cfg=MODEL_CFG), cfg=MODEL_CFG)
        tr = Trainer(model=model, anchors=anchors, config=cfg)
        state = tr.init_state(jax.random.key(5))
        _, m = tr.train_step_fn()(state, images, targets)
        metrics_by_mode[mode] = m
    full, loss_only = metrics_by_mode["full"], metrics_by_mode["loss_only"]
    assert set(loss_only) == {"loss", "loss/mask", "loss/labels", "loss/boxes"}
    assert "iou/boxes" in full
    for k in loss_only:
        np.testing.assert_allclose(
            float(loss_only[k]), float(full[k]), rtol=1e-6
        )

    import pytest

    with pytest.raises(ValueError, match="streaming_metrics"):
        Trainer(
            model=TrainableModel(module=SsdSegModel(cfg=MODEL_CFG), cfg=MODEL_CFG),
            anchors=anchors,
            config=dataclasses.replace(TRAIN_CFG, streaming_metrics="bogus"),
        )


def test_shufflenet_train_step(anchors, loader):
    """Gradients flow through channel shuffle/split: one step, finite loss."""
    import dataclasses

    cfg = dataclasses.replace(
        MODEL_CFG,
        backbone="shufflenetv2",
        shufflenet_size="0.5x",
        shufflenet_extra_depthwise=True,
        shufflenet_residuals=True,
    )
    model = TrainableModel(module=SsdSegModel(cfg=cfg), cfg=cfg)
    sh_trainer = Trainer(model=model, anchors=anchors, config=TRAIN_CFG)
    state = sh_trainer.init_state(jax.random.key(0))
    step = sh_trainer.train_step_fn()
    images, targets = next(iter(loader))
    state, m1 = step(state, images, targets)
    state, m2 = step(state, images, targets)
    assert np.isfinite(float(m1["loss"])) and np.isfinite(float(m2["loss"]))
    assert float(m2["loss"]) < float(m1["loss"])
