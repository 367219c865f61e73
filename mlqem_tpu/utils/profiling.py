"""Tracing / profiling utilities.

SURVEY §5: the reference has no systematic profiling (one ad-hoc snakeviz
cell). Here: ``jax.profiler`` trace capture as a context manager plus a
lightweight per-stage timer whose report makes data-gen throughput a
first-class metric.
"""
from __future__ import annotations

import contextlib
import time
from typing import Dict, List, Optional


class StageTimer:
    """Accumulating named-stage wall-clock timer."""

    def __init__(self):
        self.totals: Dict[str, float] = {}
        self.counts: Dict[str, int] = {}

    @contextlib.contextmanager
    def stage(self, name: str):
        t0 = time.perf_counter()
        try:
            yield
        finally:
            dt = time.perf_counter() - t0
            self.totals[name] = self.totals.get(name, 0.0) + dt
            self.counts[name] = self.counts.get(name, 0) + 1

    def report(self) -> str:
        lines = []
        for name, total in sorted(self.totals.items(),
                                  key=lambda kv: -kv[1]):
            n = self.counts[name]
            lines.append(f"{name}: {total:.3f}s total, {n} calls, "
                         f"{total / n * 1000:.1f}ms avg")
        return "\n".join(lines)

    def throughput(self, name: str, items: int) -> float:
        """items/sec for a stage."""
        return items / self.totals[name] if self.totals.get(name) else 0.0


@contextlib.contextmanager
def trace(log_dir: str):
    """Capture a jax profiler trace (view with TensorBoard/XProf)."""
    import jax

    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()
