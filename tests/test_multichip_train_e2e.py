"""Multi-chip end-to-end training: Trainer.fit epochs on an 8-way mesh.

Covers what tests/test_train.py's single-step sharding-equivalence check
does not (VERDICT round-1 item 9): the full `fit` loop — fused-transform
path (augmentation + anchor matching inlined into the train step), staged
uploads, on-device metric accumulation — running with the batch sharded
over an 8-device data-parallel mesh, plus checkpoint save + resume with
the restored state re-replicated onto the mesh.

The reference has no distributed training at all (SURVEY.md §2 parallelism
checklist); this path is net-new TPU-native capability, so the oracle is
the framework's own single-device run with an identical rng stream.
"""

import dataclasses

import jax
import numpy as np
import pytest

from ssdseglib_tpu.boxes import Anchors
from ssdseglib_tpu.checkpoint import Checkpointer
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

IMAGE_SHAPE = (64, 96)

ANCHORS_CFG = AnchorsConfig(
    feature_maps_shapes=((4, 6), (2, 3), (1, 2), (1, 1)),
    feature_maps_aspect_ratios=((1.0, 2.0, 0.5),) * 4,
    boxes_scales=(0.2, 0.9),
    centers_padding_from_borders=(0.05, 0.05, 0.05, 0.05),
    additional_square_box=True,
)

MODEL_CFG = ModelConfig(
    input_image_shape=(64, 96, 3),
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


def make_loader(seed: int = 7) -> TrainDataLoader:
    samples = generate_dataset(16, image_shape=IMAGE_SHAPE, seed=seed)
    return TrainDataLoader(
        samples,
        anchors(),
        ENC_CFG,
        batch_size=8,
        # augmentation ON: exercises the fused rng-consuming transform
        augmentation_horizontal_flip=True,
        augmentation_rgb=True,
        shuffle=False,
        seed=seed,
    )


def anchors() -> Anchors:
    return Anchors.from_config(ANCHORS_CFG, IMAGE_SHAPE)


def make_trainer() -> Trainer:
    model = TrainableModel(module=SsdSegModel(cfg=MODEL_CFG), cfg=MODEL_CFG)
    return Trainer(
        model=model,
        anchors=anchors(),
        config=TrainConfig(batch_size=8, learning_rate=3e-4, epochs=1),
    )


@pytest.fixture(scope="module")
def mesh():
    assert jax.device_count() >= 8, "conftest should force 8 virtual devices"
    return mesh_lib.make_mesh(jax.devices()[:8])


def test_fit_epoch_on_mesh_matches_single_device(mesh):
    """One fused-transform fit epoch, batch sharded 8 ways, must track the
    single-device run step for step (same rng stream, global-batch BN and
    gradient psum keep the math identical up to reduction order)."""
    trainer_1 = make_trainer()
    state_1 = trainer_1.init_state(jax.random.key(0))
    _, hist_1 = trainer_1.fit(
        state_1, make_loader(), epochs=2, log_fn=lambda s: None
    )

    trainer_8 = make_trainer()
    state_8 = trainer_8.init_state(jax.random.key(0), mesh=mesh)
    state_8, hist_8 = trainer_8.fit(
        state_8, make_loader(), epochs=2, mesh=mesh, log_fn=lambda s: None
    )

    assert len(hist_8["loss"]) == 2
    for k in hist_1:
        # Loop-level tolerances are LOOSE by design: epoch metrics average
        # steps taken after optimizer updates, so reduction-order noise is
        # amplified through Adam, and the confidence loss's hard-negative
        # top-k is discrete (a negative flipping at the k-boundary jumps
        # the loss ~1%).  Exact single-STEP sharding parity is covered at
        # rtol 2e-3 in test_train.py::test_data_parallel_matches_single_device;
        # this test asserts the whole fit loop stays on the same trajectory.
        np.testing.assert_allclose(
            hist_8[k][0], hist_1[k][0], rtol=2.5e-2, atol=1e-3, err_msg=k
        )
        np.testing.assert_allclose(
            hist_8[k][1], hist_1[k][1], rtol=1e-1, atol=5e-3, err_msg=k
        )
    # updated params hold a replicated (mesh-wide) sharding and stay finite
    leaf = jax.tree_util.tree_leaves(state_8.params)[0]
    assert np.all(np.isfinite(np.asarray(leaf)))
    assert len(leaf.sharding.device_set) == 8


def test_fit_checkpoint_resume_under_sharding(tmp_path, mesh):
    """fit -> checkpoint -> fresh trainer resumes on the mesh and continues
    training from the saved step (failure-recovery story, SURVEY.md §5)."""
    ckpt_dir = str(tmp_path / "ckpt")

    trainer_a = make_trainer()
    state_a = trainer_a.init_state(jax.random.key(1), mesh=mesh)
    ckpt = Checkpointer(ckpt_dir)
    state_a, _ = trainer_a.fit(
        state_a,
        make_loader(),
        epochs=1,
        mesh=mesh,
        checkpointer=ckpt,
        log_fn=lambda s: None,
    )
    saved_step = int(np.asarray(state_a.step))
    assert saved_step == 2  # 16 samples / batch 8
    ckpt.close()

    # fresh process simulation: new trainer, new initial state, resume
    trainer_b = make_trainer()
    state_b = trainer_b.init_state(jax.random.key(99), mesh=mesh)
    ckpt_b = Checkpointer(ckpt_dir)
    state_b, hist_b = trainer_b.fit(
        state_b,
        make_loader(),
        epochs=1,
        mesh=mesh,
        checkpointer=ckpt_b,
        resume=True,
        log_fn=lambda s: None,
    )
    ckpt_b.close()

    assert int(np.asarray(state_b.step)) == saved_step + 2
    assert np.isfinite(hist_b["loss"][-1])
    # resumed params were re-replicated onto the mesh before stepping
    leaf = jax.tree_util.tree_leaves(state_b.params)[0]
    assert len(leaf.sharding.device_set) == 8


def test_fit_on_mesh_shufflenet_smoke(mesh):
    """The second backbone family also trains end-to-end on the mesh."""
    cfg = dataclasses.replace(
        MODEL_CFG,
        backbone="shufflenetv2",
        shufflenet_size="0.5x",
        shufflenet_extra_depthwise=False,
        shufflenet_residuals=False,
    )
    model = TrainableModel(module=SsdSegModel(cfg=cfg), cfg=cfg)
    trainer = Trainer(
        model=model,
        anchors=anchors(),
        config=TrainConfig(batch_size=8, learning_rate=3e-4, epochs=1),
    )
    state = trainer.init_state(jax.random.key(2), mesh=mesh)
    state, hist = trainer.fit(
        state, make_loader(), epochs=1, mesh=mesh, log_fn=lambda s: None
    )
    assert np.isfinite(hist["loss"][0])
