"""Profiling helpers: wall-clock scopes and optional jax.profiler traces.

The reference's only instrumentation is perf_counter around the kernel loop
(gpu_ray_tracing_pro_fullColor.py:168-182); this adds structured timers plus an
opt-in XLA profiler trace for TensorBoard.
"""

from __future__ import annotations

import contextlib
import time
from typing import Dict, Iterator, Optional


class Timers:
    """Named accumulating wall-clock timers."""

    def __init__(self) -> None:
        self.totals: Dict[str, float] = {}
        self.counts: Dict[str, int] = {}

    @contextlib.contextmanager
    def scope(self, name: str) -> Iterator[None]:
        t0 = time.perf_counter()
        try:
            yield
        finally:
            dt = time.perf_counter() - t0
            self.totals[name] = self.totals.get(name, 0.0) + dt
            self.counts[name] = self.counts.get(name, 0) + 1

    def report(self) -> str:
        lines = []
        for name in sorted(self.totals, key=self.totals.get, reverse=True):
            lines.append(
                f"{name:30s} {self.totals[name]:9.3f} s  x{self.counts[name]}"
            )
        return "\n".join(lines)


@contextlib.contextmanager
def xla_trace(log_dir: Optional[str]) -> Iterator[None]:
    """Wrap a region in a jax.profiler trace when ``log_dir`` is set."""
    if not log_dir:
        yield
        return
    import jax

    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()
