"""Tracing / profiling: per-stage timers + jax.profiler integration.

The reference threads wall-clock timings through every result dict and
declares profiling debug flags it never reads (SURVEY.md §5.1). Here:

- ``stage_timer`` / ``StageTimes``: lightweight per-stage wall-clock
  accumulation for the result-dict surface.
- ``profile_trace``: context manager around ``jax.profiler.trace`` writing
  a TensorBoard-loadable trace (the TPU-native deep-profiling hook).
"""

from __future__ import annotations

import contextlib
import time
from typing import Dict, Iterator, Optional


class StageTimes:
    """Accumulates named stage durations (ms)."""

    def __init__(self) -> None:
        self.times_ms: Dict[str, float] = {}

    def record(self, name: str, seconds: float) -> None:
        self.times_ms[name] = self.times_ms.get(name, 0.0) + seconds * 1000.0

    def as_dict(self) -> Dict[str, float]:
        return {k: round(v, 3) for k, v in self.times_ms.items()}


@contextlib.contextmanager
def stage_timer(stages: StageTimes, name: str) -> Iterator[None]:
    t0 = time.perf_counter()
    try:
        yield
    finally:
        stages.record(name, time.perf_counter() - t0)


@contextlib.contextmanager
def profile_trace(log_dir: Optional[str] = None) -> Iterator[None]:
    """jax.profiler trace context; no-op when log_dir is falsy, so callers
    can gate it on a config flag (the reference's
    ``development.debug.enable_model_profiling``)."""
    if not log_dir:
        yield
        return
    import jax

    with jax.profiler.trace(log_dir):
        yield
