"""Training observability (SURVEY.md §6 metrics/logging row).

The reference logs with `print` + AverageMeter. Here: `clu.metric_writers`
when available (TensorBoard event files + stdout), falling back to a
stdout-only writer so training never depends on clu.
"""

from __future__ import annotations

from typing import Mapping


class MetricLogger:
    def __init__(self, log_dir: str | None = None):
        self._writer = None
        if log_dir is not None:
            try:
                from clu import metric_writers
                self._writer = metric_writers.create_default_writer(log_dir)
            except ImportError:
                self._writer = None

    def write(self, step: int, metrics: Mapping[str, float]) -> None:
        metrics = {k: float(v) for k, v in metrics.items()}
        if self._writer is not None:
            self._writer.write_scalars(step, metrics)
        else:
            line = " ".join(f"{k}={v:.4f}" for k, v in metrics.items())
            print(f"step {step}: {line}", flush=True)

    def flush(self) -> None:
        if self._writer is not None:
            self._writer.flush()
