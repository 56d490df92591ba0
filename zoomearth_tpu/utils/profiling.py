"""Tracing/profiling: jax.profiler trace capture + per-phase step timers.

The reference has essentially no profiling (SURVEY.md §5.1 — tqdm only, HF FLOPs
estimate disabled). Here: `trace(dir)` wraps a block in a jax.profiler trace viewable
in TensorBoard/XProf, and `PhaseTimer` accumulates wall-time per pipeline phase
(prefill / decode / crop / reward — the north-star breakdown).
"""

from __future__ import annotations

import contextlib
import json
import time
from collections import defaultdict
from typing import Dict, Optional


@contextlib.contextmanager
def trace(log_dir: str):
    """Capture a jax.profiler trace for the enclosed block."""
    import jax

    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


@contextlib.contextmanager
def annotate(name: str):
    """Named region inside a jax trace (shows up in XProf)."""
    import jax

    with jax.profiler.TraceAnnotation(name):
        yield


class PhaseTimer:
    """Accumulate wall-clock per phase; thread-safe enough for the loader pattern
    (each phase is timed on one thread)."""

    def __init__(self):
        self.totals: Dict[str, float] = defaultdict(float)
        self.counts: Dict[str, int] = defaultdict(int)

    @contextlib.contextmanager
    def phase(self, name: str, block_jax: bool = False):
        t0 = time.perf_counter()
        try:
            yield
        finally:
            if block_jax:
                import jax

                # ensure device work launched in the phase is attributed to it
                (jax.device_put(0.0) + 0).block_until_ready()
            self.totals[name] += time.perf_counter() - t0
            self.counts[name] += 1

    def summary(self) -> Dict[str, Dict[str, float]]:
        return {
            name: {
                "total_s": round(self.totals[name], 4),
                "count": self.counts[name],
                "mean_s": round(self.totals[name] / max(self.counts[name], 1), 4),
            }
            for name in sorted(self.totals)
        }

    def report(self) -> str:
        return json.dumps(self.summary(), indent=2)

    def reset(self):
        self.totals.clear()
        self.counts.clear()
