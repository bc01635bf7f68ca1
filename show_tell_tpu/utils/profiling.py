"""Tracing/profiling hooks — an aux subsystem the reference lacks
(SURVEY.md §5: only wall-clock print deltas, main.py:128,156).

Two levels:
  * ``StepTimer``: cheap per-stage wall-clock accounting (data / step /
    eval) with summary stats, for the metrics channel;
  * ``trace_profile``: context manager around jax.profiler.trace — writes
    a TensorBoard-loadable xplane trace of device activity.
"""

from __future__ import annotations

import contextlib
import time
from collections import defaultdict
from typing import Dict, Iterator, List


class StepTimer:
    def __init__(self):
        self._times: Dict[str, List[float]] = defaultdict(list)

    @contextlib.contextmanager
    def stage(self, name: str) -> Iterator[None]:
        t0 = time.perf_counter()
        try:
            yield
        finally:
            self._times[name].append(time.perf_counter() - t0)

    def summary(self) -> Dict[str, Dict[str, float]]:
        out = {}
        for name, samples in self._times.items():
            n = len(samples)
            total = sum(samples)
            out[name] = {
                "count": n,
                "total_s": total,
                "mean_ms": total / n * 1e3 if n else 0.0,
                "last_ms": samples[-1] * 1e3 if samples else 0.0,
            }
        return out

    def reset(self) -> None:
        self._times.clear()


@contextlib.contextmanager
def trace_profile(logdir: str) -> Iterator[None]:
    """Capture a device trace viewable in TensorBoard/XProf."""
    import jax

    jax.profiler.start_trace(logdir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()
