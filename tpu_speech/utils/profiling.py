"""Profiling hooks: jax.profiler traces + lightweight step timing.

The reference's observability is wall-clock RTF prints and a tiny hierarchical
profiler (DiffVC/speaker_encoder/utils/profiler.py); on TPU the real tool is
the XLA profiler — these helpers wrap it plus a step-time aggregator.
"""

from __future__ import annotations

import contextlib
import time
from collections import defaultdict
from typing import Dict, Optional

import jax


@contextlib.contextmanager
def trace(log_dir: str):
    """Capture an XLA profiler trace (view with TensorBoard's profile tab)."""
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def annotate(name: str):
    """Named region that shows up in profiler timelines."""
    return jax.profiler.TraceAnnotation(name)


class StepTimer:
    """Rolling step-time statistics (mirrors the wall/CPU-time Profiler role,
    DiffVC/speaker_encoder/utils/profiler.py:1-46)."""

    def __init__(self):
        self._t: Dict[str, float] = {}
        self._acc = defaultdict(list)

    def tick(self, name: str):
        self._t[name] = time.perf_counter()

    def tock(self, name: str):
        if name in self._t:
            self._acc[name].append(time.perf_counter() - self._t.pop(name))

    @contextlib.contextmanager
    def measure(self, name: str, sync: Optional[jax.Array] = None):
        t0 = time.perf_counter()
        try:
            yield
        finally:
            if sync is not None:
                jax.block_until_ready(sync)
            self._acc[name].append(time.perf_counter() - t0)

    def summary(self) -> Dict[str, Dict[str, float]]:
        out = {}
        for name, vals in self._acc.items():
            n = len(vals)
            mean = sum(vals) / n
            out[name] = {
                "mean_s": mean,
                "min_s": min(vals),
                "max_s": max(vals),
                "count": n,
            }
        return out
