"""Native C++ metric kernels vs the SciPy oracle."""

import ctypes

import numpy as np
import pytest

from cvpr2020_manet_tpu import native
from cvpr2020_manet_tpu.interactive import metrics as M


@pytest.fixture(scope="module")
def handle():
    h = native.lib()
    if h is None:
        pytest.skip("no g++ / native lib unavailable")
    return h


def _scipy_batched_f(pred, gt, num_objects):
    out = np.empty((pred.shape[0], num_objects), np.float64)
    for t in range(pred.shape[0]):
        for j in range(num_objects):
            out[t, j] = M.f_measure(pred[t] == j + 1, gt[t] == j + 1)
    return out.mean(axis=1)


def test_native_f_measure_matches_scipy(handle, rng):
    t, h, w = 3, 48, 64
    pred = np.zeros((t, h, w), np.int32)
    gt = np.zeros((t, h, w), np.int32)
    for f in range(t):
        y, x = rng.integers(5, 20, 2)
        gt[f, y:y + 20, x:x + 25] = 1
        pred[f, y + 2:y + 21, x + 3:x + 24] = 1
        gt[f, 30:44, 40:60] = 2
        pred[f, 31:42, 38:62] = 2
    got = M.batched_f_measure(pred, gt, 2)
    want = _scipy_batched_f(pred, gt, 2)
    np.testing.assert_allclose(got, want, atol=1e-9)


def test_native_f_measure_edge_cases(handle):
    t, h, w = 2, 16, 16
    empty = np.zeros((t, h, w), np.int32)
    full = np.ones((t, h, w), np.int32)
    # both empty -> 1.0 ; one empty -> 0.0
    np.testing.assert_allclose(M.batched_f_measure(empty, empty, 1), 1.0)
    np.testing.assert_allclose(M.batched_f_measure(empty, full, 1), 0.0)
    np.testing.assert_allclose(M.batched_f_measure(full, full, 1), 1.0)


def test_native_jaccard_matches_numpy(handle, rng):
    t, h, w = 4, 32, 40
    pred = rng.integers(0, 3, size=(t, h, w)).astype(np.int32)
    gt = rng.integers(0, 3, size=(t, h, w)).astype(np.int32)
    res = np.empty((t,), np.float64)
    for obj in (1, 2):
        handle.batched_jaccard_obj(
            np.ascontiguousarray(pred).ctypes.data_as(ctypes.c_void_p),
            np.ascontiguousarray(gt).ctypes.data_as(ctypes.c_void_p),
            t, h, w, obj, res.ctypes.data_as(ctypes.c_void_p))
        want = [M.jaccard(pred[f] == obj, gt[f] == obj) for f in range(t)]
        np.testing.assert_allclose(res, want, atol=1e-12)


def test_native_speedup(handle, rng):
    import time
    t, h, w = 8, 240, 320
    gt = np.zeros((t, h, w), np.int32)
    gt[:, 50:150, 60:200] = 1
    pred = np.roll(gt, 3, axis=2)
    t0 = time.perf_counter()
    M.batched_f_measure(pred, gt, 1)
    native_t = time.perf_counter() - t0
    t0 = time.perf_counter()
    _scipy_batched_f(pred, gt, 1)
    scipy_t = time.perf_counter() - t0
    assert native_t < scipy_t  # typically 50-200x
