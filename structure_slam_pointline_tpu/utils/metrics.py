"""Structured per-stage metrics + tracing.

The reference's observability is ad-hoc wall-clock prints
(Examples/Structure-SLAM.cc:62-102, commented-out stage timers in
LocalMapping.cc:85-147, the MyTimer helper Lineextractor.h:209-241).
Here: one registry of counters/timers/series that every stage can feed,
dumpable as JSON, plus an optional bridge to jax.profiler traces for
device-side timelines.
"""

from __future__ import annotations

import contextlib
import json
import time
from collections import defaultdict
from typing import Dict, List


class Metrics:
    """Process-wide registry: counters, timers (ms), and scalar series."""

    def __init__(self):
        self.counters: Dict[str, int] = defaultdict(int)
        self.timers: Dict[str, List[float]] = defaultdict(list)
        self.series: Dict[str, List[float]] = defaultdict(list)

    def count(self, name: str, inc: int = 1) -> None:
        self.counters[name] += inc

    def record(self, name: str, value: float) -> None:
        self.series[name].append(float(value))

    @contextlib.contextmanager
    def timer(self, name: str):
        t0 = time.perf_counter()
        try:
            yield
        finally:
            self.timers[name].append((time.perf_counter() - t0) * 1000.0)

    def summary(self) -> dict:
        def stats(xs):
            if not xs:
                return {}
            xs = sorted(xs)
            n = len(xs)
            return {
                "n": n,
                "mean": sum(xs) / n,
                "p50": xs[n // 2],
                "p90": xs[min(int(n * 0.9), n - 1)],
                "max": xs[-1],
            }

        return {
            "counters": dict(self.counters),
            "timers_ms": {k: stats(v) for k, v in self.timers.items()},
            "series": {k: stats(v) for k, v in self.series.items()},
        }

    def dump(self, path: str) -> None:
        with open(path, "w") as f:
            json.dump(self.summary(), f, indent=2)

    def reset(self) -> None:
        self.counters.clear()
        self.timers.clear()
        self.series.clear()


GLOBAL = Metrics()


@contextlib.contextmanager
def device_trace(log_dir: str):
    """jax.profiler trace around a region (view with TensorBoard/XProf)."""
    import jax

    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


__all__ = ["Metrics", "GLOBAL", "device_trace"]
