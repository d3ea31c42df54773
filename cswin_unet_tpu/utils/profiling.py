"""Profiling/observability: step timing + jax profiler traces.

The reference's only instrumentation is thop FLOPs at test time (SURVEY.md
§5); here profiling is first-class: a cheap steady-state step timer and a
context manager around ``jax.profiler`` for device traces viewable in
TensorBoard/XProf.
"""

from __future__ import annotations

import contextlib
import time

import jax


class StepTimer:
    """Rolling steady-state step timing (skips warmup/compile steps)."""

    def __init__(self, skip_first: int = 2, window: int = 50):
        self.skip_first = skip_first
        self.window = window
        self._count = 0
        self._times: list[float] = []
        self._last: float | None = None

    def tick(self) -> None:
        now = time.perf_counter()
        if self._last is not None:
            self._count += 1
            if self._count > self.skip_first:
                self._times.append(now - self._last)
                if len(self._times) > self.window:
                    self._times.pop(0)
        self._last = now

    @property
    def mean_step_s(self) -> float:
        return sum(self._times) / len(self._times) if self._times else float("nan")

    def throughput(self, items_per_step: int) -> float:
        s = self.mean_step_s
        return items_per_step / s if s == s and s > 0 else float("nan")


@contextlib.contextmanager
def device_trace(logdir: str):
    """Capture a device trace: ``with device_trace('/tmp/trace'): step()``."""
    jax.profiler.start_trace(logdir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def block_and_time(fn, *args, iters: int = 3, **kwargs) -> tuple[float, object]:
    """Best-of-N wall time of fn with a device sync (compile excluded)."""
    out = jax.block_until_ready(fn(*args, **kwargs))
    best = float("inf")
    for _ in range(iters):
        t0 = time.perf_counter()
        out = jax.block_until_ready(fn(*args, **kwargs))
        best = min(best, time.perf_counter() - t0)
    return best, out
