"""Tracing / profiling hooks (SURVEY.md §6 tracing row).

The reference has NO profiling subsystem — only the benchmark service's
wall-clock timestamps feed the AUC time axis. TPU-native we provide:
- `trace(dir)`: context manager around `jax.profiler` emitting XPlane/
  Perfetto traces viewable in TensorBoard/xprof.
- `LatencyHistogram`: per-round latency percentiles (the BASELINE-tracked
  p50 per-round latency).
- `annotate`: named TraceAnnotation spans visible in device traces.
"""

from __future__ import annotations

import contextlib
from typing import Dict, List

import numpy as np


@contextlib.contextmanager
def trace(log_dir: str):
    import jax
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def annotate(name: str):
    import jax
    return jax.profiler.TraceAnnotation(name)


class LatencyHistogram:
    def __init__(self):
        self.samples: List[float] = []

    def add(self, seconds: float):
        self.samples.append(float(seconds))

    def summary(self) -> Dict[str, float]:
        if not self.samples:
            return {}
        a = np.asarray(self.samples)
        return {
            "count": int(a.size),
            "p50": float(np.percentile(a, 50)),
            "p90": float(np.percentile(a, 90)),
            "p99": float(np.percentile(a, 99)),
            "mean": float(a.mean()),
            "max": float(a.max()),
        }
