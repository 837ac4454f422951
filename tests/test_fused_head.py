"""Fused Pallas head kernel vs the flax DynamicSegHead (norm='ln'),
interpret mode on CPU — must match including SAME-conv borders."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from cvpr2020_manet_tpu.models.heads import DynamicSegHead
from cvpr2020_manet_tpu.ops.fused_head_pallas import fused_seg_head


@pytest.mark.parametrize("o,h,w,cin,c", [
    (3, 16, 24, 40, 16),
    (2, 9, 13, 20, 8),      # ragged h (row-bucket padding path)
    (2, 10, 250, 24, 8),    # multiple column blocks with real-data halos
])
def test_fused_head_matches_flax(rng, o, h, w, cin, c):
    head = DynamicSegHead(head_channels=c, norm="ln", gn_groups=1,
                          dtype=jnp.float32)
    x = jnp.array(0.5 * rng.normal(size=(o, h, w, cin)), jnp.bfloat16
                  ).astype(jnp.float32)
    v = jax.jit(head.init)(jax.random.PRNGKey(0), x)
    want = np.asarray(head.apply(v, x))[..., 0]          # (O, h, w)

    p = v["params"]
    ln = []
    for i in range(3):
        ln += [p["stack"][f"LayerNorm_{i}"]["scale"],
               p["stack"][f"LayerNorm_{i}"]["bias"]]
    got = np.asarray(fused_seg_head(
        x,
        p["stack"]["conv0"]["kernel"], p["stack"]["conv1"]["kernel"],
        p["stack"]["conv2"]["kernel"],
        p["logit"]["kernel"][0, 0], p["logit"]["bias"],
        ln, interpret=True))
    np.testing.assert_allclose(got, want, rtol=5e-2, atol=3e-2)
    # borders must match too (stacked-SAME semantics, not zero-extension)
    np.testing.assert_allclose(got[:, :2, :], want[:, :2, :],
                               rtol=5e-2, atol=3e-2)
    np.testing.assert_allclose(got[:, :, -2:], want[:, :, -2:],
                               rtol=5e-2, atol=3e-2)
