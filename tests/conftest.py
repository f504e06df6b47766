"""Test harness config.

- forces JAX onto CPU with 8 virtual devices so multi-device sharding tests
  run without TPU hardware (SURVEY.md §4d)
- exposes the read-only reference checkout as an importable oracle: golden
  parity tests run the reference's TF/NumPy code on CPU and compare our
  jnp implementations bit-for-bit(ish) against it
"""

import os
import sys

os.environ["JAX_PLATFORMS"] = "cpu"
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8"
    ).strip()
os.environ.setdefault("CUDA_VISIBLE_DEVICES", "")
os.environ.setdefault("TF_CPP_MIN_LOG_LEVEL", "3")

# The image's sitecustomize registers an 'axon' TPU backend at interpreter
# start and force-sets jax_platforms="axon,cpu"; override it back to CPU
# before any backend initializes so tests run on 8 virtual CPU devices.
import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

REFERENCE_ROOT = "/root/reference"

import pytest  # noqa: E402


@pytest.fixture(scope="session")
def reference():
    """Import the reference `ssdseglib` package as a test oracle.

    The reference pins TF 2.13; the installed TF 2.21 (Keras 3) dropped the
    `tf.keras.saving.register_keras_serializable` alias the reference
    decorates everything with, so we shim a no-op before importing.
    """
    import tensorflow as tf

    if not hasattr(tf.keras, "saving") or not hasattr(
        tf.keras.saving, "register_keras_serializable"
    ):
        class _Saving:
            @staticmethod
            def register_keras_serializable(name=None, package=None):
                def deco(obj):
                    return obj

                return deco

        tf.keras.saving = _Saving()

    # Keras 3 dropped KerasTensor.get_shape(), which the reference's
    # ShuffleNet channel-shuffle block calls (reference models.py:494)
    try:
        from keras import KerasTensor

        if not hasattr(KerasTensor, "get_shape"):
            class _ShapeWrapper:
                def __init__(self, s):
                    self._s = s

                def as_list(self):
                    return list(self._s)

            KerasTensor.get_shape = lambda self: _ShapeWrapper(self.shape)
    except ImportError:
        pass

    if REFERENCE_ROOT not in sys.path:
        sys.path.insert(0, REFERENCE_ROOT)
    import ssdseglib as ref  # noqa: F401

    return ref


@pytest.fixture(scope="session")
def warehouse_config():
    from ssdseglib_tpu.config import reference_warehouse_config

    return reference_warehouse_config()


@pytest.fixture(scope="session")
def warehouse_anchors(warehouse_config):
    from ssdseglib_tpu.boxes import Anchors

    anchors_cfg, enc_cfg, *_ = warehouse_config
    return Anchors.from_config(anchors_cfg, enc_cfg.image_shape)
