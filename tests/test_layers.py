"""Fast resize paths must be numerically identical to jax.image.resize."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from cvpr2020_manet_tpu.models.layers import resize_bilinear, resize_nearest


@pytest.mark.parametrize("src,dst", [
    ((8, 12), (16, 24)),    # x2 up
    ((8, 12), (32, 48)),    # x4 up
    ((8, 12), (4, 6)),      # /2 down
    ((8, 12), (16, 6)),     # mixed up/down
    ((8, 12), (8, 12)),     # identity
    ((9, 13), (5, 7)),      # ragged -> fallback path
])
def test_resize_matches_jax_image(rng, src, dst):
    x = jnp.array(rng.normal(size=(*src, 3)), jnp.float32)
    got = np.asarray(resize_bilinear(x, dst))
    want = np.asarray(jax.image.resize(x, (*dst, 3), method="bilinear"))
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-6)


def test_resize_batched(rng):
    x = jnp.array(rng.normal(size=(2, 8, 8, 4)), jnp.float32)
    got = np.asarray(resize_bilinear(x, (32, 32)))
    want = np.asarray(jax.image.resize(x, (2, 32, 32, 4), method="bilinear"))
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-6)


def test_resize_preserves_dtype(rng):
    x = jnp.array(rng.normal(size=(8, 8, 4)), jnp.bfloat16)
    assert resize_bilinear(x, (16, 16)).dtype == jnp.bfloat16


def test_resize_nearest_labels():
    x = jnp.arange(4.0).reshape(2, 2, 1)
    up = np.asarray(resize_nearest(x, (4, 4)))[..., 0]
    assert set(np.unique(up)) == {0.0, 1.0, 2.0, 3.0}
