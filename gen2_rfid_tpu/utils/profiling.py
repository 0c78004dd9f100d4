"""Profiling / timing harness (tracing subsystem).

The reference's only instrumentation is a wall-clock print at termination
(``gate_impl.cc:106-107``) plus log4cpp text logs; this module provides the
TPU-native equivalents promised in SURVEY.md section 5: `jax.profiler` trace
capture around any callable, steady-state timing with compile exclusion, and
per-stage throughput counters.
"""

from __future__ import annotations

import contextlib
import dataclasses
import time
from typing import Any, Callable, Dict

import jax


@dataclasses.dataclass
class TimingResult:
    compile_s: float
    mean_s: float
    best_s: float
    iters: int

    def throughput(self, items: float) -> float:
        return items / self.mean_s


def time_jitted(fn: Callable[..., Any], *args, iters: int = 5,
                warmup: int = 1) -> TimingResult:
    """Time a jitted callable: first call(s) = compile, then steady state."""
    t0 = time.perf_counter()
    out = None
    for _ in range(max(warmup, 1)):
        out = fn(*args)
    jax.block_until_ready(out)
    compile_s = time.perf_counter() - t0

    times = []
    for _ in range(iters):
        t0 = time.perf_counter()
        out = fn(*args)
        jax.block_until_ready(out)
        times.append(time.perf_counter() - t0)
    return TimingResult(
        compile_s=compile_s,
        mean_s=sum(times) / len(times),
        best_s=min(times),
        iters=iters,
    )


@contextlib.contextmanager
def trace(log_dir: str = "/tmp/jax-trace"):
    """Capture a jax.profiler trace (view with TensorBoard / xprof)."""
    jax.profiler.start_trace(log_dir)
    try:
        yield log_dir
    finally:
        jax.profiler.stop_trace()


class StageCounters:
    """Samples/s and events/s accounting across pipeline stages."""

    def __init__(self):
        self._acc: Dict[str, Dict[str, float]] = {}

    @contextlib.contextmanager
    def stage(self, name: str, items: float = 0.0):
        t0 = time.perf_counter()
        try:
            yield
        finally:
            dt = time.perf_counter() - t0
            s = self._acc.setdefault(name, {"time_s": 0.0, "items": 0.0, "calls": 0})
            s["time_s"] += dt
            s["items"] += items
            s["calls"] += 1

    def report(self) -> Dict[str, Dict[str, float]]:
        out = {}
        for name, s in self._acc.items():
            out[name] = dict(s)
            if s["time_s"] > 0 and s["items"]:
                out[name]["items_per_s"] = s["items"] / s["time_s"]
        return out
