"""Tracing / profiling helpers (SURVEY.md §5.1).

The reference's only instrumentation is ad-hoc ``timeit`` prints
(player_recon.py:938, 1299-1300). Here:

* :class:`StepTimer` — per-stage wall-clock accumulation with summary,
* :func:`trace` — context manager around ``jax.profiler`` emitting a
  TensorBoard-loadable trace directory,
* :func:`annotate` — named trace spans for device timelines.
"""

from __future__ import annotations

import contextlib
import time
from collections import defaultdict
from typing import Dict, Iterator


class StepTimer:
    """Accumulates wall time per named stage; prints a summary table."""

    def __init__(self):
        self.totals: Dict[str, float] = defaultdict(float)
        self.counts: Dict[str, int] = defaultdict(int)

    @contextlib.contextmanager
    def stage(self, name: str) -> Iterator[None]:
        t0 = time.perf_counter()
        try:
            yield
        finally:
            self.totals[name] += time.perf_counter() - t0
            self.counts[name] += 1

    def summary(self) -> str:
        lines = [f"{'stage':<32}{'total_s':>10}{'count':>8}{'mean_ms':>10}"]
        for name in sorted(self.totals, key=lambda n: -self.totals[n]):
            total = self.totals[name]
            count = self.counts[name]
            lines.append(f"{name:<32}{total:>10.3f}{count:>8}"
                         f"{1000 * total / count:>10.2f}")
        return "\n".join(lines)


@contextlib.contextmanager
def trace(log_dir: str) -> Iterator[None]:
    """Capture a device trace viewable in TensorBoard / Perfetto."""
    import jax
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def annotate(name: str):
    """Named span on the profiler timeline (host + device)."""
    import jax
    return jax.profiler.TraceAnnotation(name)
