"""Profiling and timing utilities.

The reference's only instrumentation is host wall-clock around the solve
loop (`LDV PyCFD given by sir.py:143,160`; SURVEY.md section 5.1). TPU
equivalents here: `jax.profiler` trace annotations around solver phases and
a device-time step timer that forces completion (through the remote runtime,
`block_until_ready` alone can under-report).
"""

from __future__ import annotations

import contextlib
import time
from typing import Dict

import jax


@contextlib.contextmanager
def trace_annotation(name: str):
    """Named region for jax.profiler traces (no-op overhead when no trace
    is being captured)."""
    with jax.profiler.TraceAnnotation(name):
        yield


@contextlib.contextmanager
def profile_trace(log_dir: str):
    """Capture a profiler trace of the enclosed block into `log_dir`
    (viewable in TensorBoard / xprof)."""
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def device_time(fn, *args, reps: int = 3, **kw) -> float:
    """Best-of-`reps` wall time of `fn(*args)` with forced materialization
    of the outputs (defeats async dispatch under-reporting)."""
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        out = fn(*args, **kw)
        for leaf in jax.tree_util.tree_leaves(out):
            if hasattr(leaf, "block_until_ready"):
                leaf.block_until_ready()
        best = min(best, time.perf_counter() - t0)
    return best


class StepTimer:
    """Accumulates per-phase wall times (host-visible granularity: one
    entry per chunked device call)."""

    def __init__(self):
        self.totals: Dict[str, float] = {}
        self.counts: Dict[str, int] = {}

    @contextlib.contextmanager
    def phase(self, name: str):
        t0 = time.perf_counter()
        try:
            yield
        finally:
            self.totals[name] = self.totals.get(name, 0.0) + time.perf_counter() - t0
            self.counts[name] = self.counts.get(name, 0) + 1

    def summary(self) -> str:
        lines = []
        for name, total in sorted(self.totals.items(), key=lambda x: -x[1]):
            n = self.counts[name]
            lines.append(f"{name}: {total:.3f}s total, {total / n * 1000:.2f}ms"
                         f" avg over {n}")
        return "\n".join(lines)
