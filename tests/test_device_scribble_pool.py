"""Device-side scribble one-hot + pooling (evaluator round) must equal
the host-side helpers it replaced."""

import jax
import jax.numpy as jnp
import numpy as np

from cvpr2020_manet_tpu.engine.evaluator import downsample_mask_max
from cvpr2020_manet_tpu.interactive.scribbles import scribble_masks_per_object


def device_pool(raster, o, stride):
    """Replicates the in-round computation (engine/evaluator._round_impl)."""
    h, w = raster.shape[0] // stride, raster.shape[1] // stride
    scr = (raster >= 0).astype(jnp.float32)[..., None]
    oh = jax.nn.one_hot(jnp.clip(raster, 0, o - 1), o,
                        dtype=jnp.float32) * scr
    blockmax = lambda x: x.reshape(h, stride, w, stride, o).max(axis=(1, 3))
    return np.asarray(blockmax(oh)), np.asarray(blockmax(scr - oh))


def test_device_pool_matches_host_helpers(rng):
    hp, wp, n_obj, stride = 32, 48, 3, 4
    raster = rng.integers(-1, n_obj + 1, size=(hp, wp)).astype(np.int32)
    raster[rng.random((hp, wp)) > 0.2] = -1   # sparse scribbles

    pos_h, neg_h = scribble_masks_per_object(raster, n_obj)
    pos_want = downsample_mask_max(pos_h, stride)
    neg_want = downsample_mask_max(neg_h, stride)

    pos_got, neg_got = device_pool(jnp.asarray(raster), n_obj + 1, stride)
    np.testing.assert_array_equal(pos_got, pos_want)
    np.testing.assert_array_equal(neg_got, neg_want)
