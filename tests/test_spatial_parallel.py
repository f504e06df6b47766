"""Spatial (H-axis) model parallelism (parallel/spatial.py): hybrid
data x spatial mesh forward + train step must match single-device
numerics — XLA GSPMD inserts the conv halo exchanges and turns BN batch
stats / ASPP pooling / loss sums into psums.  Runs on the 8-virtual-CPU-
device mesh (tests/conftest.py)."""

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
from ssdseglib_tpu.models import MobileNetV2SsdSegBuilder
from ssdseglib_tpu.models.builder import SsdSegModel, TrainableModel
from ssdseglib_tpu.parallel import mesh as mesh_lib
from ssdseglib_tpu.parallel import spatial as spatial_lib
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


@pytest.fixture(scope="module")
def anchors():
    return Anchors.from_config(ANCHORS_CFG, IMAGE_SHAPE)


@pytest.fixture(scope="module")
def trainer(anchors):
    model = TrainableModel(module=SsdSegModel(cfg=MODEL_CFG), cfg=MODEL_CFG)
    return Trainer(
        model=model, anchors=anchors,
        config=TrainConfig(batch_size=8, learning_rate=3e-4, epochs=1),
    )


@pytest.fixture(scope="module")
def batch(anchors):
    loader = TrainDataLoader(
        generate_dataset(8, image_shape=IMAGE_SHAPE, seed=3),
        anchors, ENC_CFG, batch_size=8,
        augmentation_horizontal_flip=False, augmentation_rgb=False,
        shuffle=False,
    )
    return next(iter(loader))


def _inference_builder():
    n_boxes = (6 * 8 + 3 * 4 + 2 * 2 + 1 * 1) * 6
    rng = np.random.default_rng(0)
    return MobileNetV2SsdSegBuilder(
        input_image_shape=(96, 128, 3),
        number_of_boxes_per_point=6,
        number_of_classes=4,
        center_x_boxes_default=rng.uniform(0, 128, n_boxes).astype(np.float32),
        center_y_boxes_default=rng.uniform(0, 96, n_boxes).astype(np.float32),
        width_boxes_default=rng.uniform(5, 40, n_boxes).astype(np.float32),
        height_boxes_default=rng.uniform(5, 40, n_boxes).astype(np.float32),
        standard_deviations_centroids_offsets=(0.1, 0.1, 0.2, 0.2),
    )


def test_hybrid_mesh_shape_and_shardings():
    mesh = spatial_lib.make_hybrid_mesh(2, 4, jax.devices()[:8])
    assert mesh.shape == {"data": 2, "spatial": 4}
    x = np.zeros((4, 96, 128, 3), np.float32)
    xs = spatial_lib.shard_images(mesh, x)
    # each device holds a (2, 24, 128, 3) shard
    shard = xs.addressable_shards[0].data
    assert shard.shape == (2, 24, 128, 3)


def test_spatial_inference_matches_single_device():
    """Hybrid (2 data x 4 spatial) serving == single-device serving: conv
    halos, dilated ASPP branches, bilinear resizes and the batch-global
    segmentation suppression all cross shard boundaries."""
    assert jax.device_count() >= 8
    builder = _inference_builder()
    variables = builder.get_model_for_training(
        segmentation_dilation_rates=(3, 6, 12)
    ).init(jax.random.key(0))
    kwargs = dict(
        model_trained=variables,
        max_number_of_boxes_per_class=4,
        max_number_of_boxes_per_sample=10,
        boxes_iou_threshold=0.5,
        labels_probability_threshold=0.3,
        suppress_background_boxes=False,
        use_segmentation_suppression=True,
    )
    single = builder.get_model_for_inference(**kwargs)
    mesh = spatial_lib.make_hybrid_mesh(2, 4, jax.devices()[:8])
    sharded = builder.get_model_for_inference(mesh=mesh, **kwargs)

    images = np.random.default_rng(1).uniform(
        0, 255, (4, 96, 128, 3)
    ).astype(np.float32)
    mask1, det1 = single.predict(images)
    mask8, det8 = sharded.predict(images)
    np.testing.assert_allclose(mask8, mask1, rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(det8, det1, rtol=1e-3, atol=1e-4)


def test_pure_spatial_single_image():
    """The latency case a data-parallel mesh cannot serve: batch 1 over a
    (1 data x 8 spatial) mesh."""
    builder = _inference_builder()
    variables = builder.get_model_for_training(
        segmentation_dilation_rates=(3, 6, 12)
    ).init(jax.random.key(0))
    kwargs = dict(
        model_trained=variables,
        max_number_of_boxes_per_class=4,
        max_number_of_boxes_per_sample=10,
        boxes_iou_threshold=0.5,
        labels_probability_threshold=0.3,
        suppress_background_boxes=False,
        use_segmentation_suppression=False,
    )
    single = builder.get_model_for_inference(**kwargs)
    mesh = spatial_lib.make_hybrid_mesh(1, 8, jax.devices()[:8])
    sharded = builder.get_model_for_inference(mesh=mesh, **kwargs)

    image = np.random.default_rng(2).uniform(
        0, 255, (1, 96, 128, 3)
    ).astype(np.float32)
    mask1, det1 = single.predict(image)
    mask8, det8 = sharded.predict(image)
    np.testing.assert_allclose(mask8, mask1, rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(det8, det1, rtol=1e-3, atol=1e-4)


def test_spatial_train_step_matches_single_device(trainer, batch):
    """One optimizer step on the hybrid mesh == the single-device step
    (train-mode BN batch stats become two-axis psums)."""
    images, targets = batch
    step = trainer.train_step_fn()

    state1 = trainer.init_state(jax.random.key(0))
    _, metrics_single = step(state1, images, targets)

    mesh = spatial_lib.make_hybrid_mesh(2, 4, jax.devices()[:8])
    state8 = trainer.init_state(jax.random.key(0), mesh=mesh)
    images8 = mesh_lib.shard_images(mesh, images)
    targets8 = mesh_lib.shard_batch(mesh, targets)
    new_state8, metrics_sharded = step(state8, images8, targets8)

    for k in metrics_single:
        np.testing.assert_allclose(
            float(metrics_sharded[k]), float(metrics_single[k]),
            rtol=2e-3, atol=2e-4, err_msg=k,
        )
    leaf = jax.tree_util.tree_leaves(new_state8.params)[0]
    assert np.all(np.isfinite(np.asarray(leaf)))


def test_spatial_fit_via_trainer_mesh_path(trainer, anchors, monkeypatch):
    """Trainer.fit(mesh=hybrid) routes images through shard_images — in
    the fused-transform staged-upload path too (the primary
    TrainDataLoader path), so the height axis is genuinely partitioned
    over 'spatial' rather than silently replicated per group."""
    loader = TrainDataLoader(
        generate_dataset(8, image_shape=IMAGE_SHAPE, seed=5),
        anchors, ENC_CFG, batch_size=8,
        augmentation_horizontal_flip=False, augmentation_rgb=False,
        shuffle=False,
    )
    mesh = spatial_lib.make_hybrid_mesh(2, 4, jax.devices()[:8])

    import ssdseglib_tpu.train as train_mod

    specs = []
    orig = mesh_lib.shard_images

    def spy(m, images):
        out = orig(m, images)
        specs.append(tuple(out.sharding.spec))
        return out

    monkeypatch.setattr(train_mod.mesh_lib, "shard_images", spy)

    state = trainer.init_state(jax.random.key(3), mesh=mesh)
    state, hist = trainer.fit(state, loader, epochs=1, mesh=mesh)
    assert np.isfinite(hist["loss"]).all()
    assert specs, "staged upload must route images through shard_images"
    assert all(spatial_lib.SPATIAL_AXIS in s for s in specs), specs


def test_divisibility_errors():
    mesh = spatial_lib.make_hybrid_mesh(2, 4, jax.devices()[:8])
    with pytest.raises(ValueError, match="divisible.*data|data.*divisible"):
        spatial_lib.shard_images(mesh, np.zeros((3, 96, 128, 3), np.float32))
    with pytest.raises(ValueError, match="height"):
        spatial_lib.shard_images(mesh, np.zeros((2, 94, 128, 3), np.float32))
    with pytest.raises(ValueError, match="devices"):
        spatial_lib.make_hybrid_mesh(4, 4, jax.devices()[:8])
