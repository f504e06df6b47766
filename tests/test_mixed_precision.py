"""Mixed-precision training: bf16 compute, f32 master params/losses."""

import dataclasses

import jax
import numpy as np

from ssdseglib_tpu.train import Trainer
from tests.test_train import TRAIN_CFG, anchors, loader, trainer  # noqa: F401


def test_bf16_training_tracks_f32(trainer, loader, anchors):  # noqa: F811
    images, targets = next(iter(loader))

    bf16_trainer = Trainer(
        model=trainer.model,
        anchors=anchors,
        config=dataclasses.replace(TRAIN_CFG, compute_dtype="bfloat16"),
    )

    state32 = trainer.init_state(jax.random.key(0))
    state16 = bf16_trainer.init_state(jax.random.key(0))
    step32 = trainer.train_step_fn()
    step16 = bf16_trainer.train_step_fn()

    for _ in range(5):
        state32, m32 = step32(state32, images, targets)
        state16, m16 = step16(state16, images, targets)

    # master params stay f32, bn stats stay f32
    assert all(
        p.dtype == np.float32
        for p in jax.tree_util.tree_leaves(state16.params)
    )
    assert all(
        p.dtype == np.float32
        for p in jax.tree_util.tree_leaves(state16.batch_stats)
    )
    # loss trajectory within a few percent of f32 after 5 steps
    l32, l16 = float(m32["loss"]), float(m16["loss"])
    assert np.isfinite(l16)
    assert abs(l16 - l32) / l32 < 0.05, (l16, l32)
