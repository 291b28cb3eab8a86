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


def packed_fetch(chunks: List[Dict[str, Any]]) -> List[Dict[str, np.ndarray]]:
    """Materialize a list of scalar-metric dicts with ONE device->host
    transfer.

    On the tunneled TPU backend every ``np.asarray(device_array)`` is a
    full round trip (~38 ms); fetching a training log's metrics one array
    at a time was costing ~15 ms/step (scripts/diag_e2e_overhead.py run D
    vs B: 30.6 vs 55.1 steps/s on the reference object step).  Here all
    buffered values are raveled and concatenated into one device vector,
    fetched once, then split back on the host.

    Each dict's values may be scalars or (K,) per-step arrays; host numpy
    values pass through untouched.
    """
    import jax.numpy as jnp

    parts: List[Any] = []
    layout: List[List[Any]] = []  # per chunk: [(name, size, shape)]
    host: List[Dict[str, np.ndarray]] = []
    for scalars in chunks:
        meta = []
        hdict: Dict[str, np.ndarray] = {}
        for name in sorted(scalars):
            v = scalars[name]
            if isinstance(v, (int, float, np.ndarray, np.number)):
                hdict[name] = np.atleast_1d(np.asarray(v, np.float64))
                continue
            flat = jnp.ravel(v).astype(jnp.float32)
            meta.append((name, flat.shape[0]))
            parts.append(flat)
        layout.append(meta)
        host.append(hdict)
    if parts:
        packed = np.asarray(jnp.concatenate(parts))  # the single fetch
        off = 0
        for meta, hdict in zip(layout, host):
            for name, size in meta:
                hdict[name] = packed[off:off + size].astype(np.float64)
                off += size
    return host


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
