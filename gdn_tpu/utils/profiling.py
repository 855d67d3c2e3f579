"""Tracing/profiling hooks (SURVEY.md §5: the reference has none; the
TPU-native rebuild exposes jax.profiler + structured step timing).

- ``trace(logdir)``: context manager around jax.profiler.trace; view the
  result with TensorBoard's profile plugin / Perfetto / XProf.
- ``annotate(name)``: TraceAnnotation for custom spans inside a step.
- ``StepTimer``: wall-clock per-step timing with warmup exclusion and a
  summary (mean/p50/p95) — forces completion via value fetch, because
  block_until_ready can return early through remote-TPU tunnels (see
  bench.py).
"""

from __future__ import annotations

import contextlib
import time
from typing import Dict, Iterator, List, Optional

import jax
import numpy as np


@contextlib.contextmanager
def trace(logdir: str) -> Iterator[None]:
    jax.profiler.start_trace(logdir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def annotate(name: str):
    """Named span visible in profiler traces."""
    return jax.profiler.TraceAnnotation(name)


class StepTimer:
    def __init__(self, warmup: int = 2):
        self.warmup = warmup
        self._times: List[float] = []
        self._count = 0
        self._t0: Optional[float] = None

    def start(self) -> None:
        self._t0 = time.perf_counter()

    def stop(self, result=None) -> float:
        """Stops the clock; if `result` is given, fetches one scalar
        from it first to force device completion."""
        if result is not None:
            leaves = jax.tree.leaves(result)
            if leaves:
                np.asarray(leaves[0]).ravel()[:1]  # forced device fetch
        assert self._t0 is not None, "start() not called"
        dt = time.perf_counter() - self._t0
        self._count += 1
        if self._count > self.warmup:
            self._times.append(dt)
        return dt

    def summary(self) -> Dict[str, float]:
        if not self._times:
            return {"steps": 0}
        arr = np.asarray(self._times)
        return {
            "steps": len(arr),
            "mean_s": float(arr.mean()),
            "p50_s": float(np.percentile(arr, 50)),
            "p95_s": float(np.percentile(arr, 95)),
        }
