"""Profiling / tracing utilities.

The reference has no profiler at all (closest: tqdm postfix losses,
reference: optimized_train.py:195). Here:

- :func:`start_trace_server` exposes the jax profiler so TensorBoard /
  xprof can connect live to a training or serving process;
- :func:`trace` context manager captures a trace for a code region;
- :class:`StepTimer` — lightweight rolling step timing (wall time,
  images/sec) for logging hot-loop throughput without a profiler.
"""

from __future__ import annotations

import contextlib
import time
from collections import deque


def start_trace_server(port: int = 9999) -> None:
    """Start the jax profiler server (connect with TensorBoard's profile
    plugin or xprof at localhost:<port>)."""
    import jax

    jax.profiler.start_server(port)


@contextlib.contextmanager
def trace(log_dir: str):
    """Capture a jax profiler trace of the enclosed region into log_dir."""
    import jax

    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


class StepTimer:
    """Rolling window step timer: call ``tick(n_items)`` once per step."""

    def __init__(self, window: int = 50):
        self._times: deque[float] = deque(maxlen=window + 1)
        self._items: deque[int] = deque(maxlen=window)
        self._times.append(time.perf_counter())

    def tick(self, n_items: int = 1) -> None:
        self._times.append(time.perf_counter())
        self._items.append(n_items)

    @property
    def steps_per_sec(self) -> float:
        if len(self._times) < 2:
            return 0.0
        dt = self._times[-1] - self._times[0]
        return (len(self._times) - 1) / dt if dt > 0 else 0.0

    @property
    def items_per_sec(self) -> float:
        if len(self._times) < 2:
            return 0.0
        dt = self._times[-1] - self._times[0]
        return sum(self._items) / dt if dt > 0 else 0.0

    @property
    def ms_per_step(self) -> float:
        sps = self.steps_per_sec
        return 1000.0 / sps if sps > 0 else float("inf")
