"""Stage timing + device profiling hooks.

The reference has no tracing (SURVEY.md §5); this provides per-stage
wall-clock accounting for the host pipeline (consensus / tokenize / pack /
device) and a context manager around ``jax.profiler`` for device traces.
"""

from __future__ import annotations

import contextlib
import logging
import time
from collections import defaultdict

log = logging.getLogger(__name__)


class StageTimer:
    """Accumulates wall-clock per named stage; thread-safe enough for the
    single-producer host pipeline."""

    def __init__(self):
        self.totals: dict[str, float] = defaultdict(float)
        self.counts: dict[str, int] = defaultdict(int)

    @contextlib.contextmanager
    def stage(self, name: str):
        t0 = time.perf_counter()
        try:
            yield
        finally:
            dt = time.perf_counter() - t0
            self.totals[name] += dt
            self.counts[name] += 1

    def summary(self) -> dict[str, dict]:
        return {
            name: {
                "total_s": round(self.totals[name], 4),
                "count": self.counts[name],
                "mean_ms": round(1e3 * self.totals[name] / max(self.counts[name], 1), 2),
            }
            for name in sorted(self.totals)
        }

    def log_summary(self, prefix: str = "stage timing"):
        for name, stats in self.summary().items():
            log.info("%s: %-18s %8.1f ms total  (%d calls, %.2f ms/call)",
                     prefix, name, stats["total_s"] * 1e3, stats["count"],
                     stats["mean_ms"])


@contextlib.contextmanager
def device_trace(log_dir: str):
    """jax.profiler trace around a region; view with TensorBoard/XProf."""
    import jax

    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()
