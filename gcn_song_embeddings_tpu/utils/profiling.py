"""Tracing / profiling utilities.

The reference's only instrumentation is manual `time.time()` deltas
(SURVEY §5): phase prints during feature generation, precompute progress,
epoch timing, and a train/emb/knn timing tuple persisted in the eval cache.
This module provides the structured equivalents:

  * `Timer` / `timed` — wall-clock phase timing that records into a dict
    (feeding the same `t (train)/t (emb)/t (knn)` table columns).
  * `device_profile` — a `jax.profiler` trace context for XLA-level kernel
    profiles (view with TensorBoard / xprof).
  * `throughput` — edges/s / hops/s style counters for the benchmark
    metrics (BASELINE.json headline metric is edges/s/chip).

NOTE (axon platform): `jax.block_until_ready` does not reliably block on
the tunneled device; `sync()` forces a tiny device->host transfer instead.
"""

from __future__ import annotations

import contextlib
import json
import time
from typing import Any, Iterator

import numpy as np


def sync(x: Any) -> None:
    """Reliably wait for device values (works around axon's non-blocking
    block_until_ready — see bench.py)."""
    import jax

    for leaf in jax.tree_util.tree_leaves(x):
        np.asarray(leaf)


class Timer:
    """Accumulating named phase timer.

    >>> t = Timer()
    >>> with t.phase("train"): ...
    >>> t.times["train"]
    """

    def __init__(self) -> None:
        self.times: dict[str, float] = {}

    @contextlib.contextmanager
    def phase(self, name: str, sync_value: Any = None) -> Iterator[None]:
        t0 = time.time()
        try:
            yield
        finally:
            if sync_value is not None:
                sync(sync_value)
            self.times[name] = self.times.get(name, 0.0) + time.time() - t0

    def to_json(self) -> str:
        return json.dumps(self.times, sort_keys=True)


@contextlib.contextmanager
def device_profile(log_dir: str) -> Iterator[None]:
    """XLA-level profiler trace (tensorboard-compatible)."""
    import jax

    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def throughput(n_units: float, seconds: float, unit: str = "edges"
               ) -> dict[str, float | str]:
    return {"value": n_units / max(seconds, 1e-12), "unit": f"{unit}/s",
            "seconds": seconds}


class MetricsLogger:
    """JSON-lines metrics sink with the reference's wandb field names
    (pinsage_training.py:241-246); if the `wandb` package is importable
    and WANDB_MODE is configured, mirrors every row there too."""

    def __init__(self, path: str, wandb_project: str | None = None,
                 run_name: str | None = None):
        self.path = path
        self._wandb = None
        if wandb_project is not None:
            try:
                import wandb  # optional; absent in this image

                wandb.init(project=wandb_project, name=run_name)
                self._wandb = wandb
            except Exception:
                self._wandb = None

    def log(self, row: dict) -> None:
        with open(self.path, "a") as f:
            f.write(json.dumps(row) + "\n")
        if self._wandb is not None:
            self._wandb.log(row)
