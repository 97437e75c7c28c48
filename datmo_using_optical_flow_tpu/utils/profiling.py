"""Tracing / profiling hooks (SURVEY.md §5.1 — absent in the reference).

Per-stage wall-clock accumulation on the host plus ``jax.profiler`` trace
annotations so stages show up named in TensorBoard/Perfetto traces captured with
``jax.profiler.start_trace``.
"""

from __future__ import annotations

import contextlib
import time
from collections import defaultdict


class StageTimer:
    """Accumulates wall-clock per named stage; prints a simple report."""

    def __init__(self):
        self.totals: dict[str, float] = defaultdict(float)
        self.counts: dict[str, int] = defaultdict(int)

    @contextlib.contextmanager
    def stage(self, name: str):
        import jax.profiler

        t0 = time.perf_counter()
        with jax.profiler.TraceAnnotation(name):
            yield
        self.totals[name] += time.perf_counter() - t0
        self.counts[name] += 1

    def report(self) -> str:
        lines = ["stage                     total(s)   calls   per-call(ms)"]
        for name, total in sorted(self.totals.items(), key=lambda kv: -kv[1]):
            n = self.counts[name]
            lines.append(f"{name:<25} {total:8.3f} {n:7d} {total / n * 1000:12.2f}")
        return "\n".join(lines)


@contextlib.contextmanager
def trace(path: str):
    """Capture a device trace viewable in TensorBoard/Perfetto."""
    import jax.profiler

    jax.profiler.start_trace(path)
    try:
        yield
    finally:
        jax.profiler.stop_trace()
