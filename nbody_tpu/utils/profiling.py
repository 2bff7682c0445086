"""Tracing / profiling / telemetry.

The reference's observability (SURVEY.md §5): `log` macros + env_logger, a
60-sample frame-time ring buffer feeding the egui stats grid
(src/vis.rs:22,53-68), and out-of-process `perf stat` counters
(perf_benchmark.py).  TPU equivalents:

  * ``trace(dir)``      — context manager around ``jax.profiler`` emitting a
                          TensorBoard/XProf trace (device timeline, HLO ops);
                          the replacement for perf's hardware counters.
  * ``StepTimer``       — host-side ring-buffer telemetry (steps/s, mean/p50/
                          p99 step latency), the headless analog of the
                          frame-time ring buffer.
  * ``annotate(name)``  — named profiler span (``jax.profiler.TraceAnnotation``)
  * ``flops_of(fn, *args)`` — XLA cost analysis of a jitted callable, the
                          replacement for perf's FLOP counters
                          (fp_ret_sse_avx_ops, perf_benchmark.py:97).
  * structured logging via the stdlib ``logging`` (logger "nbody_tpu").
"""

from __future__ import annotations

import contextlib
import logging
import statistics
import time
from collections import deque

import jax

log = logging.getLogger("nbody_tpu")


@contextlib.contextmanager
def trace(log_dir: str):
    """Profile a region into ``log_dir`` (view with TensorBoard/XProf)."""
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def annotate(name: str):
    """Named span visible in profiler traces."""
    return jax.profiler.TraceAnnotation(name)


class StepTimer:
    """Ring-buffer step telemetry (reference: 60-sample frame ring,
    src/vis.rs:22,53-68)."""

    def __init__(self, window: int = 60):
        self.samples = deque(maxlen=window)
        self._t0 = None

    def __enter__(self):
        self._t0 = time.perf_counter()
        return self

    def __exit__(self, *exc):
        self.samples.append(time.perf_counter() - self._t0)

    @property
    def steps_per_second(self) -> float:
        if not self.samples:
            return 0.0
        return len(self.samples) / max(sum(self.samples), 1e-12)

    def summary(self) -> dict:
        if not self.samples:
            return {}
        s = sorted(self.samples)
        return {
            "steps_per_second": round(self.steps_per_second, 3),
            "mean_ms": round(statistics.mean(s) * 1e3, 3),
            "p50_ms": round(s[len(s) // 2] * 1e3, 3),
            "p99_ms": round(s[min(len(s) - 1, int(len(s) * 0.99))] * 1e3, 3),
        }


def flops_of(jitted, *args, **kwargs) -> dict:
    """XLA cost analysis (flops / bytes accessed) of one invocation."""
    compiled = jitted.lower(*args, **kwargs).compile()
    cost = compiled.cost_analysis() or {}
    return {
        "flops": cost.get("flops"),
        "bytes_accessed": cost.get("bytes accessed"),
    }
