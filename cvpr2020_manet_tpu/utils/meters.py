"""Small training-loop observability helpers (SURVEY.md C19)."""

from __future__ import annotations


class AverageMeter:
    """Running average (reference keeps the same utility in ref:utils)."""

    def __init__(self):
        self.reset()

    def reset(self):
        self.sum = 0.0
        self.count = 0

    def update(self, value: float, n: int = 1):
        self.sum += float(value) * n
        self.count += n

    @property
    def avg(self) -> float:
        return self.sum / max(self.count, 1)
