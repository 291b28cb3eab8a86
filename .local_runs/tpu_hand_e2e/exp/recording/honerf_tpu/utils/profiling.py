"""Profiling and step-timing utilities.

The reference has no tracing at all (SURVEY.md §5); here:
  * `trace(logdir)` wraps a region in a `jax.profiler` trace viewable in
    TensorBoard/Perfetto;
  * `StepTimer` measures real device step time — on the tunneled TPU
    backend `block_until_ready` can return before the device finishes, so
    the timer forces a scalar VALUE fetch of one of the step's outputs;
  * `annotate(name)` adds a named TraceAnnotation around host-side phases.
"""

from __future__ import annotations

import contextlib
import time
from typing import Any, Dict, List, Optional

import numpy as np

import jax


@contextlib.contextmanager
def trace(logdir: Optional[str]):
    """jax.profiler trace context (no-op when logdir is None)."""
    if logdir is None:
        yield
        return
    jax.profiler.start_trace(logdir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def annotate(name: str):
    """Named annotation visible in profiler timelines."""
    return jax.profiler.TraceAnnotation(name)


def force_value(x) -> float:
    """Materialize a scalar from a device array — the only reliable
    completion barrier on the tunneled backend."""
    return float(np.asarray(x).reshape(-1)[0])


class StepTimer:
    """Rolling wall-clock step timing with sync points.

    Usage:
        timer = StepTimer(sync_every=50)
        for ...:
            state, metrics = step(...)
            timer.tick(metrics["loss"])
        print(timer.summary())
    """

    def __init__(self, sync_every: int = 50):
        self.sync_every = sync_every
        self._count = 0
        self._t0: Optional[float] = None
        self._samples: List[float] = []

    def tick(self, probe) -> None:
        if self._t0 is None:
            force_value(probe)  # drain pipeline before the window opens
            self._t0 = time.perf_counter()
            self._count = 0
            return
        self._count += 1
        if self._count % self.sync_every == 0:
            force_value(probe)
            now = time.perf_counter()
            self._samples.append((now - self._t0) / self.sync_every)
            self._t0 = now
            self._count = 0

    def summary(self) -> Dict[str, Any]:
        if not self._samples:
            return {"steps_per_sec": None, "ms_per_step": None}
        ms = float(np.median(self._samples) * 1e3)
        return {"steps_per_sec": 1e3 / ms, "ms_per_step": ms}
