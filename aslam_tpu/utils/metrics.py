"""Observability: stage timers, counters, structured logging, profiler.

The reference has wall-clock-only timing (cv::TickMeter around Track,
main.cpp:97-101) and HUD counters (SURVEY.md §5).  Here every pipeline
stage can be timed (including device time via block_until_ready), counters
accumulate into a structured log, and `jax.profiler` traces can be
captured around any section for XLA-level analysis.
"""

from __future__ import annotations

import contextlib
import json
import time
from collections import defaultdict


class Metrics:
    def __init__(self):
        self.timers = defaultdict(list)
        self.counters = defaultdict(int)
        self.series = defaultdict(list)

    @contextlib.contextmanager
    def timer(self, name: str, sync=None):
        """Time a section; pass a jax array as `sync` to include device
        completion (block_until_ready) in the measurement."""
        t0 = time.perf_counter()
        holder = {}
        try:
            yield holder
        finally:
            obj = holder.get("sync", sync)
            if obj is not None:
                import jax

                jax.block_until_ready(obj)
            self.timers[name].append(time.perf_counter() - t0)

    def count(self, name: str, n: int = 1):
        self.counters[name] += n

    def record(self, name: str, value: float):
        self.series[name].append(float(value))

    def summary(self) -> dict:
        out = {"counters": dict(self.counters)}
        out["timers"] = {
            k: {
                "n": len(v),
                "mean_ms": 1e3 * sum(v) / max(len(v), 1),
                "total_s": sum(v),
                "max_ms": 1e3 * max(v) if v else 0.0,
            }
            for k, v in self.timers.items()
        }
        out["series"] = {
            k: {"n": len(v), "mean": sum(v) / max(len(v), 1)}
            for k, v in self.series.items()
        }
        return out

    def dump(self, path: str):
        with open(path, "w") as f:
            json.dump(self.summary(), f, indent=2)


@contextlib.contextmanager
def xla_trace(logdir: str):
    """Capture a jax.profiler trace (view with TensorBoard/XProf)."""
    import jax

    jax.profiler.start_trace(logdir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


GLOBAL = Metrics()
