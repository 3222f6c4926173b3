"""Profiling helpers: jax.profiler traces + step-time statistics.

The tracing/observability subsystem the reference lacks entirely
(SURVEY.md §5 "Tracing/profiling: none"): `trace()` captures an xplane
trace viewable in TensorBoard/XProf; `StepTimer` accumulates wall-clock
step times and reports p50/p95/mean for quick regressions.
"""

import contextlib
import time
from typing import Optional

import numpy as np
import jax


@contextlib.contextmanager
def trace(log_dir: str):
    """Capture a jax.profiler trace (xplane) for the enclosed block."""
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


class StepTimer:
    """Wall-clock step statistics; call tick() once per step."""

    def __init__(self, skip_first: int = 2):
        self.skip_first = skip_first
        self._times = []
        self._last: Optional[float] = None
        self._seen = 0

    def tick(self):
        now = time.perf_counter()
        if self._last is not None:
            self._seen += 1
            if self._seen > self.skip_first:
                self._times.append(now - self._last)
        self._last = now

    def stats(self) -> dict:
        if not self._times:
            return {"steps": 0}
        arr = np.asarray(self._times)
        return {
            "steps": len(arr),
            "mean_s": float(arr.mean()),
            "p50_s": float(np.percentile(arr, 50)),
            "p95_s": float(np.percentile(arr, 95)),
            "steps_per_s": float(1.0 / arr.mean()),
        }
