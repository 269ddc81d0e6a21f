"""Profiling — first-class replacement for the reference's vestigial
--profile-log-dir flag and py-spy comments (SURVEY.md §5.1):
jax.profiler trace context, per-step timing stats, and a simple
tokens/sec meter.
"""

from __future__ import annotations

import contextlib
import time
from typing import Dict, List, Optional


@contextlib.contextmanager
def trace(log_dir: Optional[str]):
    """jax.profiler trace (open with TensorBoard / xprof). No-op when
    log_dir is None."""
    if not log_dir:
        yield
        return
    import jax
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


class StepTimer:
    """Wall-clock step timing with warmup skip and percentile summary."""

    def __init__(self, skip_first: int = 2):
        self.skip_first = skip_first
        self.times: List[float] = []
        self._t0: Optional[float] = None
        self._seen = 0

    def start(self) -> None:
        self._t0 = time.perf_counter()

    def stop(self, tokens: int = 0) -> float:
        dt = time.perf_counter() - self._t0
        self._seen += 1
        if self._seen > self.skip_first:
            self.times.append(dt)
        self._last_tokens = tokens
        return dt

    def summary(self) -> Dict[str, float]:
        if not self.times:
            return {}
        import numpy as np
        t = np.asarray(self.times)
        return {
            "steps": len(t),
            "mean_s": float(t.mean()),
            "p50_s": float(np.percentile(t, 50)),
            "p90_s": float(np.percentile(t, 90)),
            "max_s": float(t.max()),
        }
