"""Tracing / profiling hooks (SURVEY.md §5: the reference only has
time.time() FPS prints, run_heuristic.py:52-58).

Provides jax.profiler trace capture, per-stage step timers, and
steps/sec/chip counters feeding the benchmark metrics.
"""
from __future__ import annotations

import contextlib
import time
from typing import Dict, Optional

import jax


@contextlib.contextmanager
def trace(log_dir: str = "/tmp/swarm_ode_tpu_trace"):
    """Capture a jax.profiler trace (view with xprof/tensorboard)."""
    jax.profiler.start_trace(log_dir)
    try:
        yield log_dir
    finally:
        jax.profiler.stop_trace()


class StageTimer:
    """Wall-clock accumulator per pipeline stage (env step / graph build /
    odeint / grad), with steps-per-second summaries."""

    def __init__(self):
        self.totals: Dict[str, float] = {}
        self.counts: Dict[str, int] = {}

    @contextlib.contextmanager
    def stage(self, name: str, block_on=None):
        t0 = time.perf_counter()
        yield
        if block_on is not None:
            jax.block_until_ready(block_on)
        dt = time.perf_counter() - t0
        self.totals[name] = self.totals.get(name, 0.0) + dt
        self.counts[name] = self.counts.get(name, 0) + 1

    def summary(self, units_per_call: Optional[Dict[str, float]] = None):
        out = {}
        for name, tot in self.totals.items():
            n = self.counts[name]
            rec = {"total_s": tot, "calls": n, "mean_s": tot / n}
            if units_per_call and name in units_per_call:
                rec["throughput"] = units_per_call[name] * n / tot
            out[name] = rec
        return out


def device_throughput(fn, args, units: float, repeats: int = 3) -> float:
    """Best-of-N throughput (units/sec) of a jitted callable."""
    out = fn(*args)
    jax.block_until_ready(out)
    best = 0.0
    for _ in range(repeats):
        t0 = time.perf_counter()
        out = fn(*args)
        jax.block_until_ready(out)
        best = max(best, units / (time.perf_counter() - t0))
    return best
