"""`davisinteractive.metrics` — batched J / boundary-F in the upstream
calling convention (upstream: davisinteractive/metrics/jaccard.py,
f_measure.py; SURVEY.md C20).

Upstream convention: ``(y_true, y_pred)`` argument order,
``nb_objects=None`` inferred from the ground truth, and
``average_over_objects`` selecting `(T,)` (mean over objects) vs
`(T, nb_objects)` output. The framework's
`cvpr2020_manet_tpu.interactive.metrics` uses ``(pred, gt,
num_objects)`` and always averages; this module adapts. The averaged
paths delegate to the framework (which routes boundary-F through the
native C++ EDT kernel when built).
"""

from typing import Optional

import numpy as np

from cvpr2020_manet_tpu.interactive import metrics as _m

__all__ = ["batched_jaccard", "batched_f_measure"]


def _nb_objects(y_true: np.ndarray, nb_objects: Optional[int]) -> int:
    if nb_objects is not None:
        return int(nb_objects)
    n = int(np.max(y_true)) if y_true.size else 0
    return max(n, 1)


def batched_jaccard(y_true: np.ndarray, y_pred: np.ndarray,
                    average_over_objects: bool = True,
                    nb_objects: Optional[int] = None) -> np.ndarray:
    """Per-frame Jaccard. `y_true`/`y_pred`: (T, H, W) int label maps
    (0 = background, objects 1..nb_objects)."""
    y_true = np.asarray(y_true)
    y_pred = np.asarray(y_pred)
    n = _nb_objects(y_true, nb_objects)
    if average_over_objects:
        return _m.batched_jaccard(y_pred, y_true, n)
    out = np.empty((y_true.shape[0], n), np.float64)
    for t in range(y_true.shape[0]):
        for j in range(n):
            out[t, j] = _m.jaccard(y_pred[t] == j + 1, y_true[t] == j + 1)
    return out


def batched_f_measure(y_true: np.ndarray, y_pred: np.ndarray,
                      average_over_objects: bool = True,
                      nb_objects: Optional[int] = None,
                      bound_th: float = 0.008) -> np.ndarray:
    """Per-frame boundary F-measure. Same conventions as
    `batched_jaccard`."""
    y_true = np.asarray(y_true)
    y_pred = np.asarray(y_pred)
    n = _nb_objects(y_true, nb_objects)
    if average_over_objects:
        return _m.batched_f_measure(y_pred, y_true, n, bound_th=bound_th)
    out = np.empty((y_true.shape[0], n), np.float64)
    for t in range(y_true.shape[0]):
        for j in range(n):
            out[t, j] = _m.f_measure(
                y_pred[t] == j + 1, y_true[t] == j + 1, bound_th)
    return out
