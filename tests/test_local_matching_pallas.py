"""Golden tests: Pallas local-matching band kernel vs the jnp oracle
(interpret mode on CPU)."""

import jax.numpy as jnp
import numpy as np
import pytest

from cvpr2020_manet_tpu.ops.local_matching_pallas import local_matching_pallas
from cvpr2020_manet_tpu.ops.matching import local_matching


@pytest.mark.parametrize("h,w,c,o,win", [
    (12, 16, 8, 3, 2),
    (10, 9, 5, 2, 3),       # ragged height vs rows_per_block
    (16, 24, 16, 9, 4),
])
def test_local_kernel_matches_oracle(rng, h, w, c, o, win):
    q = (0.2 * rng.normal(size=(h, w, c))).astype(np.float32)
    k = (0.2 * rng.normal(size=(h, w, c))).astype(np.float32)
    m = np.eye(o, dtype=np.float32)[rng.integers(0, o, (h, w))]
    want = np.asarray(local_matching(
        jnp.array(q), jnp.array(k), jnp.array(m), window=win))
    got = np.asarray(local_matching_pallas(
        jnp.array(q), jnp.array(k), jnp.array(m), window=win,
        interpret=True))
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-6)


def test_local_kernel_empty_object_saturates(rng):
    h, w, c, o = 8, 8, 4, 3
    q = rng.normal(size=(h, w, c)).astype(np.float32)
    k = rng.normal(size=(h, w, c)).astype(np.float32)
    m = np.zeros((h, w, o), np.float32)
    m[..., 0] = 1.0
    got = np.asarray(local_matching_pallas(
        jnp.array(q), jnp.array(k), jnp.array(m), window=2, interpret=True))
    assert got[..., 1].min() == 1.0 and got[..., 2].min() == 1.0
    assert got[..., 0].max() < 1.0
