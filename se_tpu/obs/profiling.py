"""Profiling hooks: JAX device profiler traces + step timing.

The reference's only profiling is wall-clock epoch timing and a console
ETA bar (SURVEY.md section 5).  Here: a context manager capturing an XLA
device trace viewable in TensorBoard/Perfetto, and a simple step timer.
"""

from __future__ import annotations

import contextlib
import time
from typing import Iterator, Optional

import jax


@contextlib.contextmanager
def device_trace(logdir: str) -> Iterator[None]:
    """Capture a jax.profiler trace (open with TensorBoard's profile tab
    or ui.perfetto.dev)."""
    jax.profiler.start_trace(logdir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


class StepTimer:
    """Running mean/last step wall-clock; negligible overhead."""

    def __init__(self):
        self.n = 0
        self.total = 0.0
        self.last = 0.0
        self._t0: Optional[float] = None

    def __enter__(self):
        self._t0 = time.perf_counter()
        return self

    def __exit__(self, *exc):
        self.last = time.perf_counter() - self._t0
        self.total += self.last
        self.n += 1
        return False

    @property
    def mean(self) -> float:
        return self.total / max(self.n, 1)
