"""Step timing → frames/sec accounting.

The reference had no profiling at all (SURVEY.md §5.1 — only a wall-clock
stamp in the config).  This is the BASELINE metric plumbing: per-step wall
time with warmup exclusion, frames/sec/chip, and optional ``jax.profiler``
trace capture around a window of steps.
"""

from __future__ import annotations

import time
from dataclasses import dataclass, field
from typing import List, Optional


@dataclass
class StepTimer:
    """Collects per-step durations; excludes the first ``warmup`` steps
    (compile + cache fill) from throughput stats."""

    warmup: int = 2
    _t0: Optional[float] = None
    durations: List[float] = field(default_factory=list)

    def start(self) -> None:
        self._t0 = time.perf_counter()

    def stop(self) -> float:
        dt = time.perf_counter() - self._t0
        self.durations.append(dt)
        return dt

    @property
    def steady(self) -> List[float]:
        """Post-warmup durations.  A run too short to pass warmup falls
        back to the LAST duration only — never the full list, which would
        average the first step's multi-second compile into the reported
        throughput."""
        if len(self.durations) > self.warmup:
            return self.durations[self.warmup:]
        return self.durations[-1:]

    def mean_step_s(self) -> float:
        s = self.steady
        return sum(s) / len(s) if s else float("nan")

    def frames_per_sec(self, batch_size: int) -> float:
        m = self.mean_step_s()
        return batch_size / m if m and m == m else float("nan")


class trace_capture:
    """``with trace_capture(logdir): ...`` wraps a window of steps in a
    jax.profiler trace (viewable in TensorBoard's profile plugin)."""

    def __init__(self, logdir):
        self.logdir = str(logdir)

    def __enter__(self):
        import jax

        jax.profiler.start_trace(self.logdir)
        return self

    def __exit__(self, *exc):
        import jax

        jax.profiler.stop_trace()
        return False
