"""Profiling hooks (SURVEY.md §5: the reference has only wall-clock meters).

- `trace(dir)` context manager wraps jax.profiler for TensorBoard traces.
- `StepTimer` tracks images/sec with device synchronisation — the north-star
  throughput counter.
"""

from __future__ import annotations

import contextlib
import time

import jax


@contextlib.contextmanager
def trace(log_dir: str):
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


class StepTimer:
    def __init__(self):
        self.images = 0
        self.seconds = 0.0
        self._t0 = None

    def start(self):
        self._t0 = time.perf_counter()

    def stop(self, result, n_images: int):
        """Blocks on `result` so timing covers real device execution."""
        jax.block_until_ready(result)
        self.seconds += time.perf_counter() - self._t0
        self.images += n_images

    @property
    def images_per_sec(self) -> float:
        return self.images / self.seconds if self.seconds else 0.0
