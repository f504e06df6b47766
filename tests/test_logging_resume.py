"""Structured logging + checkpoint-resume behavior."""

import json

import jax
import numpy as np

from ssdseglib_tpu.checkpoint import Checkpointer
from ssdseglib_tpu.utils.logging import MetricsLogger
from tests.test_train import trainer, loader, anchors  # fixtures  # noqa: F401


def test_metrics_logger(tmp_path):
    path = str(tmp_path / "log" / "metrics.jsonl")
    with MetricsLogger(path) as logger:
        logger.log({"loss": 1.5, "note": "a"}, step=1)
        logger.log({"loss": np.float32(0.5)}, step=2)
    lines = [json.loads(l) for l in open(path)]
    assert lines[0]["loss"] == 1.5 and lines[0]["step"] == 1
    assert lines[1]["loss"] == 0.5
    assert "time" in lines[0] and "elapsed_s" in lines[0]


def test_fit_resume_from_checkpoint(tmp_path, trainer, loader):  # noqa: F811
    ckpt = Checkpointer(str(tmp_path / "ckpt"))
    logger = MetricsLogger(str(tmp_path / "metrics.jsonl"))

    state = trainer.init_state(jax.random.key(0))
    state, _ = trainer.fit(
        state, loader, epochs=1, checkpointer=ckpt,
        metrics_logger=logger, log_fn=lambda s: None,
    )
    saved_step = int(np.asarray(state.step))
    assert ckpt.latest_step() == saved_step

    # a "crashed" fresh process resumes from the checkpoint
    fresh = trainer.init_state(jax.random.key(99))
    messages = []
    resumed, _ = trainer.fit(
        fresh, loader, epochs=1, checkpointer=ckpt, resume=True,
        log_fn=messages.append,
    )
    assert any("resumed from checkpoint" in m for m in messages)
    assert int(np.asarray(resumed.step)) == 2 * saved_step
    ckpt.close()
    logger.close()

    records = [json.loads(l) for l in open(str(tmp_path / "metrics.jsonl"))]
    assert records and "loss" in records[0]
