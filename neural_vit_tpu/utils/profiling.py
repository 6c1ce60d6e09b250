"""Tracing / profiling utilities.

The reference has no profiler integration — only coarse `time.perf_counter`
wall-clock blocks in the baselines (SURVEY §5). Here profiling is
first-class:

  * `trace(logdir)` — context manager around `jax.profiler` emitting a
    TensorBoard-viewable device trace (compute, HBM traffic, fusion view);
  * `StepTimer` — rolling per-stage wall-clock timers whose summaries feed
    the same metrics JSONL as training metrics, preserving the reference's
    "timing block in the metrics JSON" convention.
"""

from __future__ import annotations

import time
from collections import defaultdict
from contextlib import contextmanager
from typing import Dict


@contextmanager
def trace(logdir: str):
    """Device+host profiler trace → `logdir` (view in TensorBoard)."""
    import jax

    jax.profiler.start_trace(logdir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


class StepTimer:
    """Named rolling wall-clock timers.

        timer = StepTimer()
        with timer.section("data"):
            ...
        with timer.section("step"):
            ...
        timer.summary()  # {"data_s": ..., "step_s": ...}
    """

    def __init__(self) -> None:
        self._total = defaultdict(float)
        self._count = defaultdict(int)

    @contextmanager
    def section(self, name: str):
        t0 = time.perf_counter()
        try:
            yield
        finally:
            self._total[name] += time.perf_counter() - t0
            self._count[name] += 1

    def summary(self, reset: bool = False) -> Dict[str, float]:
        out = {}
        for name, total in self._total.items():
            out[f"{name}_s"] = total
            out[f"{name}_mean_s"] = total / max(1, self._count[name])
        if reset:
            self._total.clear()
            self._count.clear()
        return out
