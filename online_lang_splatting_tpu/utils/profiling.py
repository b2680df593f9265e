"""Profiling/tracing helpers (reference uses paired CUDA events,
slam.py:58-60; the TPU-native equivalents are jax.profiler traces and
materialization-fenced wall timers)."""

from __future__ import annotations

import contextlib
import time
from collections import defaultdict

import jax


@contextlib.contextmanager
def trace(log_dir: str):
    """Capture a jax.profiler trace viewable in TensorBoard/Perfetto."""
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


class Timers:
    """Wall-clock spans with device fencing.

    Spans call block_until_ready on a provided array (or sync all devices)
    so async dispatch doesn't misattribute time. Usage:

        timers = Timers()
        with timers.span("tracking", fence=out.color):
            ...
        print(timers.report())
    """

    def __init__(self):
        self.totals = defaultdict(float)
        self.counts = defaultdict(int)

    @contextlib.contextmanager
    def span(self, name: str, fence=None):
        t0 = time.perf_counter()
        yield
        if fence is not None:
            jax.block_until_ready(fence)
        dt = time.perf_counter() - t0
        self.totals[name] += dt
        self.counts[name] += 1

    def report(self) -> str:
        lines = []
        for name in sorted(self.totals):
            n = self.counts[name]
            tot = self.totals[name]
            lines.append(
                f"{name}: total {tot:.3f}s over {n} calls "
                f"({tot / max(n, 1) * 1000:.1f} ms avg)"
            )
        return "\n".join(lines)
