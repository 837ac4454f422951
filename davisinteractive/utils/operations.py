"""`davisinteractive.utils.operations` — line/curve rasterization
primitives (upstream: davisinteractive/utils/operations.py).

Upstream exposes `bresenham(points)` (rasterize a polyline given as an
(N, 2) integer array, returning every lattice pixel along consecutive
segments) and `bezier_curve(points, nb_points)` (a Bézier curve using
the path points as control points). Both are standard public
algorithms; `bresenham` delegates to the framework's pairwise
implementation (`cvpr2020_manet_tpu.interactive.scribbles.bresenham`).
"""

from math import comb

import numpy as np

from cvpr2020_manet_tpu.interactive.scribbles import (
    bresenham as _bresenham_pair)

__all__ = ["bresenham", "bezier_curve"]


def bresenham(points) -> np.ndarray:
    """Rasterize the polyline through `points` ((N, 2) int array of
    [x, y]) — every lattice pixel on every consecutive segment, with the
    shared endpoint of adjacent segments emitted once."""
    points = np.asarray(points)
    if points.ndim != 2 or points.shape[1] != 2:
        raise ValueError(f"points must be (N, 2), got {points.shape}")
    if len(points) == 0:
        return points.astype(np.int64)
    if len(points) == 1:
        return points.astype(np.int64)
    segs = [_bresenham_pair(points[0], points[1])]
    for i in range(1, len(points) - 1):
        # drop the first pixel: it is the previous segment's endpoint
        segs.append(_bresenham_pair(points[i], points[i + 1])[1:])
    return np.concatenate(segs, axis=0)


def bezier_curve(points, nb_points: int = 1000) -> np.ndarray:
    """Bézier curve with `points` ((N, 2) float array) as control
    points, sampled at `nb_points` parameter values in [0, 1].

    B(t) = sum_i C(n, i) t^i (1-t)^(n-i) P_i  (Bernstein basis).
    Returns an (nb_points, 2) float array. Used by
    `scribbles2mask(..., bezier_curve_sampling=True)`.
    """
    points = np.asarray(points, dtype=np.float64)
    if points.ndim != 2 or points.shape[1] != 2:
        raise ValueError(f"points must be (N, 2), got {points.shape}")
    n = len(points)
    if n == 0:
        return np.zeros((0, 2), np.float64)
    if n == 1:
        return np.repeat(points, nb_points, axis=0)
    t = np.linspace(0.0, 1.0, nb_points)[:, None]          # (S, 1)
    i = np.arange(n)[None, :]                              # (1, N)
    coef = np.array([comb(n - 1, k) for k in range(n)])[None, :]
    basis = coef * t ** i * (1.0 - t) ** (n - 1 - i)       # (S, N)
    return basis @ points
