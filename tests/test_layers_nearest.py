import jax
import jax.numpy as jnp
import numpy as np
import pytest

from cvpr2020_manet_tpu.models.layers import resize_nearest


@pytest.mark.parametrize("src,dst", [
    ((8, 12), (16, 24)), ((8, 12), (4, 6)), ((8, 12), (2, 3)),
    ((8, 12), (8, 12)), ((8, 12), (24, 4)), ((9, 13), (5, 7)),
])
def test_nearest_matches_jax_image(rng, src, dst):
    x = jnp.array(rng.integers(0, 5, size=(*src, 2)), jnp.float32)
    got = np.asarray(resize_nearest(x, dst))
    want = np.asarray(jax.image.resize(x, (*dst, 2), method="nearest"))
    np.testing.assert_array_equal(got, want)
