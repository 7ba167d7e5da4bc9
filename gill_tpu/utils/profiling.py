"""Profiling / tracing (SURVEY §5: the reference only has wall-clock meters;
the TPU-native equivalent is jax.profiler traces viewable in TensorBoard
or Perfetto)."""

from __future__ import annotations

import contextlib
import time


@contextlib.contextmanager
def trace(log_dir: str):
    """Captures a jax.profiler trace for the enclosed block:

        with profiling.trace(log_dir):
            step(...)
    """
    import jax

    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


class StepTimer:
    """Per-step host timing with EMA, for examples/sec style metrics."""

    def __init__(self, alpha: float = 0.1):
        self.alpha = alpha
        self.ema = None
        self._t0 = None

    def start(self):
        self._t0 = time.perf_counter()

    def stop(self) -> float:
        dt = time.perf_counter() - self._t0
        self.ema = dt if self.ema is None else \
            (1 - self.alpha) * self.ema + self.alpha * dt
        return dt
