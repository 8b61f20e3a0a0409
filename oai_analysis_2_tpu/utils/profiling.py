"""First-class tracing & timing.

The reference's only observability is a notebook %%time and bare print()s
(SURVEY.md §5). Here: structured per-stage wall timers, an optional JAX
profiler trace (XLA/TPU timeline viewable in TensorBoard/Perfetto), and a
process-wide stage registry that the cohort runtime records per item.
"""

from __future__ import annotations

import contextlib
import json
import time
from collections import defaultdict
from typing import Dict, Optional


class StageTimer:
    """Accumulates wall time per named stage."""

    def __init__(self):
        self.totals: Dict[str, float] = defaultdict(float)
        self.counts: Dict[str, int] = defaultdict(int)

    @contextlib.contextmanager
    def stage(self, name: str, sync=None):
        """Time a stage; pass `sync=arrays` to block on device results so the
        measurement covers the actual TPU execution, not just dispatch."""
        t0 = time.perf_counter()
        try:
            yield
        finally:
            if sync is not None:
                import jax

                jax.block_until_ready(sync)
            dt = time.perf_counter() - t0
            self.totals[name] += dt
            self.counts[name] += 1

    def report(self) -> dict:
        return {
            name: {"seconds": round(t, 4), "calls": self.counts[name]}
            for name, t in sorted(self.totals.items())
        }

    def print_report(self):
        print(json.dumps(self.report(), indent=1))


GLOBAL_TIMER = StageTimer()


@contextlib.contextmanager
def trace(log_dir: Optional[str] = None):
    """Capture a JAX profiler trace (TPU timeline) around a code region."""
    import jax

    if log_dir is None:
        yield
        return
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()
