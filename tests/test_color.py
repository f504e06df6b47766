"""Parity tests for color augmentation vs tf.image adjust_* kernels."""

import numpy as np
import pytest

from ssdseglib_tpu.ops import color


@pytest.fixture(scope="module")
def images():
    rng = np.random.default_rng(0)
    return rng.uniform(0, 255, size=(2, 16, 20, 3)).astype(np.float32)


def test_hsv_roundtrip(images):
    rgb = images / 255.0
    back = np.asarray(color.hsv_to_rgb(color.rgb_to_hsv(rgb)))
    np.testing.assert_allclose(back, rgb, rtol=1e-4, atol=1e-4)


def test_rgb_to_hsv_parity(images):
    import tensorflow as tf

    ours = np.asarray(color.rgb_to_hsv(images / 255.0))
    theirs = tf.image.rgb_to_hsv(images / 255.0).numpy()
    np.testing.assert_allclose(ours, theirs, rtol=1e-4, atol=1e-4)


@pytest.mark.parametrize("delta", [-0.05, 0.02, 0.05])
def test_adjust_hue_parity(images, delta):
    import tensorflow as tf

    ours = np.asarray(color.adjust_hue(images, delta))
    theirs = tf.image.adjust_hue(images, delta).numpy()
    np.testing.assert_allclose(ours, theirs, rtol=1e-3, atol=0.05)


@pytest.mark.parametrize("factor", [0.95, 1.05])
def test_adjust_saturation_parity(images, factor):
    import tensorflow as tf

    ours = np.asarray(color.adjust_saturation(images, factor))
    theirs = tf.image.adjust_saturation(images, factor).numpy()
    np.testing.assert_allclose(ours, theirs, rtol=1e-3, atol=0.05)


@pytest.mark.parametrize("factor", [0.9, 1.1])
def test_adjust_contrast_parity(images, factor):
    import tensorflow as tf

    ours = np.asarray(color.adjust_contrast(images, factor))
    theirs = tf.image.adjust_contrast(images, factor).numpy()
    np.testing.assert_allclose(ours, theirs, rtol=1e-4, atol=1e-2)


def test_augmentation_pipeline_bounds(images):
    import jax

    out = np.asarray(
        color.augmentation_rgb_channels(jax.random.key(0), images)
    )
    assert out.shape == images.shape
    assert out.min() >= 0.0 and out.max() <= 255.0
    # small perturbation, not identity
    assert not np.allclose(out, images)
    assert np.abs(out - images).mean() < 30.0
