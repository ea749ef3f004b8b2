"""Per-stage timing instrumentation.

Equivalent of the reference's ``Stopwatch`` + per-module debug timing
fields (reference include/mimosa/stopwatch.hpp:11-113; t_full, t_preprocess,
t_deskew, t_declare, t_define, t_update_map in
mimosa_msgs/msg/LidarManagerDebug.msg). Host wall-clock only — device-side
stage boundaries are invisible inside a fused XLA program by design; use
``jax.profiler.trace`` for intra-step breakdowns.
"""

from __future__ import annotations

import contextlib
import time
from collections import defaultdict


class Stopwatch:
    """Elapsed/lap/tick wall-clock timer (ref stopwatch.hpp semantics)."""

    def __init__(self):
        self.reset()

    def reset(self):
        self._t0 = time.perf_counter()
        self._last = self._t0

    def elapsed(self) -> float:
        return time.perf_counter() - self._t0

    def lap(self) -> float:
        now = time.perf_counter()
        dt = now - self._last
        self._last = now
        return dt


class StageTimer:
    """Accumulates per-stage wall times and counts across iterations.

    >>> t = StageTimer()
    >>> with t.stage("deskew"):
    ...     work()
    >>> t.summary()   # {'deskew': {'total_s': ..., 'count': ..., 'mean_ms': ...}}
    """

    def __init__(self):
        self.totals = defaultdict(float)
        self.counts = defaultdict(int)

    @contextlib.contextmanager
    def stage(self, name: str):
        t0 = time.perf_counter()
        try:
            yield
        finally:
            self.totals[name] += time.perf_counter() - t0
            self.counts[name] += 1

    def summary(self):
        return {
            k: dict(total_s=self.totals[k], count=self.counts[k],
                    mean_ms=self.totals[k] / max(self.counts[k], 1) * 1e3)
            for k in sorted(self.totals)
        }

    def report(self) -> str:
        lines = [f"{'stage':24s} {'count':>7s} {'mean ms':>9s} {'total s':>9s}"]
        for k, v in self.summary().items():
            lines.append(f"{k:24s} {v['count']:7d} {v['mean_ms']:9.2f} "
                         f"{v['total_s']:9.2f}")
        return "\n".join(lines)
