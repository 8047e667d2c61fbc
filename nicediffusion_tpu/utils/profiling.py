"""Tracing/profiling hooks (SURVEY.md §5.1 — absent in the reference, which
has only tqdm progress bars; this is the TPU-native observability layer).

Wraps jax.profiler so the trainer/CLI can capture device traces viewable in
TensorBoard/Perfetto, plus a simple wall-clock step timer.
"""

from __future__ import annotations

import contextlib
import time

import jax

__all__ = ["trace", "StepTimer"]


@contextlib.contextmanager
def trace(logdir: str = "/tmp/jax-trace", enabled: bool = True):
    """Capture a device trace for the enclosed block.

    View with: tensorboard --logdir <logdir>  (or open the .trace.json.gz in
    Perfetto).
    """
    if not enabled:
        yield
        return
    jax.profiler.start_trace(logdir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


class StepTimer:
    """Rolling wall-clock timing of train/sample steps."""

    def __init__(self, window: int = 50):
        self.window = window
        self._times: list[float] = []
        self._last: float | None = None

    def tick(self) -> float | None:
        now = time.perf_counter()
        dt = None
        if self._last is not None:
            dt = now - self._last
            self._times.append(dt)
            if len(self._times) > self.window:
                self._times.pop(0)
        self._last = now
        return dt

    @property
    def steps_per_sec(self) -> float:
        if not self._times:
            return 0.0
        return len(self._times) / sum(self._times)
