"""Phase timers and profiler hooks.

The reference has no tracing/profiling beyond rank-0 prints (SURVEY.md §5);
here every solve phase is timed and the JAX profiler can capture device
traces (`with trace("step"): ...` writes a TensorBoard-loadable trace).
"""

from __future__ import annotations

import contextlib
import time
from collections import defaultdict
from typing import Dict, Optional


class Timers:
    """Accumulating named wall-clock timers."""

    def __init__(self):
        self.totals: Dict[str, float] = defaultdict(float)
        self.counts: Dict[str, int] = defaultdict(int)

    @contextlib.contextmanager
    def phase(self, name: str):
        t0 = time.perf_counter()
        try:
            yield
        finally:
            self.totals[name] += time.perf_counter() - t0
            self.counts[name] += 1

    def report(self) -> str:
        lines = []
        for name in sorted(self.totals, key=self.totals.get, reverse=True):
            lines.append(
                f"  {name:<24s} {self.totals[name]:9.3f}s"
                f"  ({self.counts[name]}x)"
            )
        return "\n".join(lines)


@contextlib.contextmanager
def device_trace(logdir: Optional[str]):
    """jax.profiler trace when logdir is set; no-op otherwise."""
    if not logdir:
        yield
        return
    import jax

    jax.profiler.start_trace(logdir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()
