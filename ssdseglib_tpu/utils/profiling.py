"""Profiling + timing harness.

The reference has no profiling at all (SURVEY.md §5: `model.fit(verbose=0)`
suppresses even progress bars).  This module provides:

- `time_jit_fn`: robust steady-state throughput/latency measurement of a
  jitted callable (`block_until_ready` fencing, warmup, percentiles)
- `trace`: a context manager around `jax.profiler` emitting a TensorBoard-
  loadable trace directory for per-op analysis on real TPU hardware
"""

from __future__ import annotations

import contextlib
import dataclasses
import time
from typing import Any, Callable, Dict, Sequence

import jax
import numpy as np


@dataclasses.dataclass
class Timing:
    mean_s: float
    p50_s: float
    p95_s: float
    min_s: float
    steps: int

    def throughput(self, items_per_step: int) -> float:
        return items_per_step / self.mean_s

    def as_dict(self) -> Dict[str, Any]:
        return dataclasses.asdict(self)


def time_jit_fn(
    fn: Callable,
    args: Sequence[Any],
    warmup: int = 3,
    steps: int = 20,
) -> Timing:
    """Steady-state per-call timing of a (jitted) function.

    Each step is fenced with `block_until_ready` so host-side dispatch
    pipelining doesn't hide device time.
    """
    for _ in range(warmup):
        out = fn(*args)
    jax.block_until_ready(out)

    durations = []
    for _ in range(steps):
        t0 = time.perf_counter()
        out = fn(*args)
        jax.block_until_ready(out)
        durations.append(time.perf_counter() - t0)
    d = np.asarray(durations)
    return Timing(
        mean_s=float(d.mean()),
        p50_s=float(np.percentile(d, 50)),
        p95_s=float(np.percentile(d, 95)),
        min_s=float(d.min()),
        steps=steps,
    )


@contextlib.contextmanager
def trace(log_dir: str):
    """Capture a jax.profiler trace (view with TensorBoard / xprof)."""
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()
