"""Tracing and per-stage timing (SURVEY.md §5: absent in the reference
beyond tqdm bars; first-class here because slices/sec/chip is the
headline metric).

- ``annotate``: jax.profiler trace annotations around pipeline stages
  (visible in TensorBoard / xprof captures).
- ``trace_to``: context manager starting/stopping a profiler trace dir.
- ``StageTimer``: wall-clock per-stage accounting with a log summary.
- ``ThroughputMeter``: items/sec counter that blocks on device results
  so jit dispatch asynchrony can't fake the number.
"""

from __future__ import annotations

import contextlib
import logging
import time
from typing import Dict, Optional

logger = logging.getLogger(__name__)


def annotate(name: str):
    """Trace-annotation context (no-op if the profiler is unavailable)."""
    try:
        import jax.profiler
        return jax.profiler.TraceAnnotation(name)
    except Exception:  # pragma: no cover
        return contextlib.nullcontext()


@contextlib.contextmanager
def trace_to(log_dir: str):
    """Capture a profiler trace for the enclosed block."""
    import jax.profiler
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


class StageTimer:

    def __init__(self) -> None:
        self.totals: Dict[str, float] = {}
        self.counts: Dict[str, int] = {}

    @contextlib.contextmanager
    def stage(self, name: str):
        with annotate(name):
            t0 = time.perf_counter()
            try:
                yield
            finally:
                dt = time.perf_counter() - t0
                self.totals[name] = self.totals.get(name, 0.0) + dt
                self.counts[name] = self.counts.get(name, 0) + 1

    def summary(self) -> Dict[str, Dict[str, float]]:
        return {name: {"total_s": total,
                       "calls": self.counts[name],
                       "mean_s": total / self.counts[name]}
                for name, total in self.totals.items()}

    def log_summary(self, heading: str = "stage timing") -> None:
        logger.info("%s:", heading)
        for name, s in sorted(self.summary().items(),
                              key=lambda kv: -kv[1]["total_s"]):
            logger.info("  %-24s %8.3f s  (%d calls, %.4f s/call)",
                        name, s["total_s"], s["calls"], s["mean_s"])


class ThroughputMeter:
    """items/sec over device work; ``add`` blocks on the result so the
    async dispatch queue can't inflate the rate."""

    def __init__(self, unit: str = "items"):
        self.unit = unit
        self.n = 0
        self.t0: Optional[float] = None
        self.elapsed = 0.0

    def add(self, n_items: int, device_result=None) -> None:
        if self.t0 is None:
            self.t0 = time.perf_counter()
        if device_result is not None:
            try:
                device_result.block_until_ready()
            except AttributeError:
                pass
        self.n += n_items
        self.elapsed = time.perf_counter() - self.t0

    @property
    def rate(self) -> float:
        return self.n / self.elapsed if self.elapsed > 0 else 0.0

    def log(self) -> None:
        logger.info("throughput: %.1f %s/sec (%d %s in %.2f s)",
                    self.rate, self.unit, self.n, self.unit, self.elapsed)
