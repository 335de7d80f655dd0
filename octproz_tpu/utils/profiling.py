"""Profiling helpers: JAX device traces and per-stage wall-clock timing.

The reference has no built-in tracer (profiling is external nvvp/Nsight,
performance/v180/performance_v180.md:57-75); here tracing is first-class:
``trace()`` wraps ``jax.profiler`` (view with TensorBoard or Perfetto) and
``StageTimer`` gives cheap named wall-clock sections with summaries, the
per-stage analog of the reference's live throughput box.
"""

from __future__ import annotations

import collections
import contextlib
import time
from typing import Dict, Iterator, List


@contextlib.contextmanager
def trace(log_dir: str) -> Iterator[None]:
    """Capture a JAX device trace into ``log_dir``.

    Usage::

        with profiling.trace("/tmp/oct-trace"):
            engine.run(max_buffers=100)
    """
    import jax

    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


class StageTimer:
    """Named wall-clock sections with count/total/mean summaries.

    Synchronous measurement: call ``block_until_ready`` inside the section if
    you want device time included (JAX dispatch is async).
    """

    def __init__(self):
        self._totals: Dict[str, float] = collections.defaultdict(float)
        self._counts: Dict[str, int] = collections.defaultdict(int)

    @contextlib.contextmanager
    def section(self, name: str) -> Iterator[None]:
        t0 = time.perf_counter()
        try:
            yield
        finally:
            self._totals[name] += time.perf_counter() - t0
            self._counts[name] += 1

    def summary(self) -> List[dict]:
        out = []
        for name in sorted(self._totals, key=self._totals.get, reverse=True):
            total = self._totals[name]
            n = self._counts[name]
            out.append({"stage": name, "calls": n,
                        "total_s": round(total, 4),
                        "mean_ms": round(total / n * 1e3, 3)})
        return out

    def report(self) -> str:
        lines = [f"{r['stage']:<24} {r['calls']:>6} calls  "
                 f"{r['total_s']:>9.3f} s total  {r['mean_ms']:>8.3f} ms/call"
                 for r in self.summary()]
        return "\n".join(lines)

    def reset(self) -> None:
        self._totals.clear()
        self._counts.clear()
