"""Tracing and performance observability.

The reference's only profiling is wall-clock meters (SURVEY.md §5). Here:

* :func:`trace` — context manager around ``jax.profiler`` producing a
  TensorBoard-loadable trace directory (XLA op-level timeline);
* :func:`annotate` — named TraceAnnotation for custom spans;
* :class:`StepTimer` — steps/sec + items/sec with correct device syncing;
* :func:`device_memory_stats` — per-device HBM usage when the backend
  reports it.
"""

from __future__ import annotations

import contextlib
import time

import jax


@contextlib.contextmanager
def trace(log_dir: str):
    """Capture a profiler trace: ``with trace('/tmp/trace'): step()``."""
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def annotate(name: str):
    """Named span visible in the trace viewer."""
    return jax.profiler.TraceAnnotation(name)


class StepTimer:
    """Throughput meter that blocks on device results before timestamping."""

    def __init__(self):
        self.reset()

    def reset(self):
        self._t0 = None
        self.steps = 0
        self.items = 0.0
        self.elapsed = 0.0

    def start(self):
        self._t0 = time.perf_counter()

    def step(self, outputs=None, items: float = 0.0):
        """Call once per step; pass device outputs to synchronize on."""
        if outputs is not None:
            jax.block_until_ready(outputs)
        now = time.perf_counter()
        if self._t0 is not None:
            self.elapsed += now - self._t0
            self.steps += 1
            self.items += items
        self._t0 = now

    @property
    def steps_per_sec(self):
        return self.steps / self.elapsed if self.elapsed else 0.0

    @property
    def items_per_sec(self):
        return self.items / self.elapsed if self.elapsed else 0.0


def device_memory_stats(device=None):
    """{'bytes_in_use': ..., 'peak_bytes_in_use': ...} or {} if unsupported."""
    device = device or jax.devices()[0]
    try:
        stats = device.memory_stats()
        return dict(stats) if stats else {}
    except Exception:
        return {}
