"""Throughput metering + device tracing.

The reference only wall-clocks iterations (scripts_cvppp/main.py:330-346).
Here: a megapixels/sec meter (the BASELINE headline metric) and a
jax.profiler trace context for kernel-level inspection.
"""

from __future__ import annotations

import contextlib
import time


class ThroughputMeter:
    """Tracks items (e.g. megapixels) per second with warmup skipping."""

    def __init__(self, warmup: int = 2):
        self.warmup = warmup
        self.count = 0
        self.items = 0.0
        self.t0 = None

    def step(self, n_items: float):
        self.count += 1
        if self.count == self.warmup:
            self.t0 = time.perf_counter()
            self.items = 0.0
        elif self.count > self.warmup:
            self.items += n_items

    @property
    def rate(self) -> float:
        if self.t0 is None or self.items == 0:
            return 0.0
        return self.items / (time.perf_counter() - self.t0)


@contextlib.contextmanager
def trace_context(log_dir: str | None):
    """jax.profiler trace when log_dir given; no-op otherwise."""
    if log_dir is None:
        yield
        return
    import jax

    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()
