"""Per-stage wall-clock instrumentation.

The reference hand-rolls an elapsed_times dict written into every
result.json record (batch_spalign_kmeans.py:428-458: time_superpixel,
time_roialign, time_prior, time_kmeans, elapsed_time).  StageTimer keeps
that observable surface, and also integrates with jax.profiler traces for
real TPU profiling (start_trace/stop_trace)."""

from __future__ import annotations

import contextlib
import time
from typing import Dict


class StageTimer:
    def __init__(self):
        self._t0 = time.time()
        self.times: Dict[str, float] = {}

    @contextlib.contextmanager
    def stage(self, name: str):
        st = time.time()
        try:
            yield
        finally:
            self.times[f"time_{name}"] = (
                self.times.get(f"time_{name}", 0.0) + time.time() - st)

    def finish(self) -> Dict[str, float]:
        self.times["elapsed_time"] = time.time() - self._t0
        return dict(self.times)


@contextlib.contextmanager
def profiler_trace(log_dir: str | None):
    """jax.profiler trace around a region when log_dir is set."""
    if not log_dir:
        yield
        return
    import jax

    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()
