"""Golden tests for the pure-jnp matching oracle vs brute-force NumPy."""

import numpy as np
import jax.numpy as jnp

from cvpr2020_manet_tpu.ops import matching as M


def brute_global(query, ref, onehot, valid=None):
    nq = query.shape[0]
    o = onehot.shape[1]
    d = ((query[:, None, :] - ref[None, :, :]) ** 2).sum(-1)  # (Nq, Nk)
    out = np.full((nq, o), M.WRONG_LABEL_PADDING_DISTANCE, np.float64)
    for j in range(o):
        sel = onehot[:, j] > 0
        if valid is not None:
            sel = sel & (valid > 0)
        if sel.any():
            out[:, j] = d[:, sel].min(axis=1)
    return out


def brute_local(query, prev, onehot, window):
    h, w, _ = query.shape
    o = onehot.shape[-1]
    out = np.full((h, w, o), M.WRONG_LABEL_PADDING_DISTANCE, np.float64)
    for y in range(h):
        for x in range(w):
            for dy in range(-window, window + 1):
                for dx in range(-window, window + 1):
                    yy, xx = y + dy, x + dx
                    if not (0 <= yy < h and 0 <= xx < w):
                        continue
                    d = ((query[y, x] - prev[yy, xx]) ** 2).sum()
                    for j in range(o):
                        if onehot[yy, xx, j] > 0:
                            out[y, x, j] = min(out[y, x, j], d)
    return out


def norm(d):
    return 1.0 - 2.0 / (1.0 + np.exp(np.minimum(d, 30.0)))


def test_global_matching_matches_bruteforce(rng):
    nq, nk, c, o = 37, 53, 8, 3
    q = rng.normal(size=(nq, c)).astype(np.float32)
    k = rng.normal(size=(nk, c)).astype(np.float32)
    labels = rng.integers(0, o, size=(nk,))
    onehot = np.eye(o, dtype=np.float32)[labels]
    got = np.asarray(M.global_matching(jnp.array(q), jnp.array(k),
                                       jnp.array(onehot), chunk=16))
    want = norm(brute_global(q, k, onehot))
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)


def test_global_matching_validity_mask(rng):
    nq, nk, c, o = 10, 24, 4, 2
    q = rng.normal(size=(nq, c)).astype(np.float32)
    k = rng.normal(size=(nk, c)).astype(np.float32)
    onehot = np.eye(o, dtype=np.float32)[rng.integers(0, o, size=(nk,))]
    valid = (rng.random(nk) > 0.5).astype(np.float32)
    got = np.asarray(M.global_matching(
        jnp.array(q), jnp.array(k), jnp.array(onehot),
        jnp.array(valid), chunk=8))
    want = norm(brute_global(q, k, onehot, valid))
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)


def test_global_matching_empty_object_saturates(rng):
    q = rng.normal(size=(5, 4)).astype(np.float32)
    k = rng.normal(size=(6, 4)).astype(np.float32)
    onehot = np.zeros((6, 2), np.float32)
    onehot[:, 0] = 1.0  # object 1 has no reference pixels
    got = np.asarray(M.global_matching(jnp.array(q), jnp.array(k),
                                       jnp.array(onehot), chunk=8))
    np.testing.assert_allclose(got[:, 1], 1.0, atol=1e-6)
    assert (got[:, 0] < 1.0).all()


def test_local_matching_matches_bruteforce(rng):
    h, w, c, o, win = 7, 9, 5, 3, 2
    q = rng.normal(size=(h, w, c)).astype(np.float32)
    p = rng.normal(size=(h, w, c)).astype(np.float32)
    onehot = np.eye(o, dtype=np.float32)[rng.integers(0, o, size=(h, w))]
    got = np.asarray(M.local_matching(jnp.array(q), jnp.array(p),
                                      jnp.array(onehot), window=win))
    want = norm(brute_local(q, p, onehot, win))
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)


def test_normalize_distance_range():
    d = jnp.array([0.0, 1.0, 100.0, M.WRONG_LABEL_PADDING_DISTANCE])
    n = np.asarray(M.normalize_distance(d))
    assert n[0] == 0.0
    assert np.all(np.diff(n) >= 0)
    assert n[-1] <= 1.0 and n[-1] > 0.999
