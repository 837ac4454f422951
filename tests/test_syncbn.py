"""SyncBN capability (SURVEY.md C10): the reference vendors a ~600-line
thread/pipe synchronized BatchNorm; TPU-native it is
`nn.BatchNorm(axis_name=...)` inside a shard_map'd step — batch moments
are reduced across the 'data' axis with one pmean. This test pins that the
sharded result equals single-device BN over the full batch."""

import functools

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn
from jax.sharding import PartitionSpec as P

from cvpr2020_manet_tpu.models.layers import make_norm
from cvpr2020_manet_tpu.parallel.mesh import create_mesh


class BNNet(nn.Module):
    sync: bool

    @nn.compact
    def __call__(self, x):
        norm = make_norm("syncbn" if self.sync else "bn", jnp.float32,
                         axis_name="data" if self.sync else None)
        return norm()(x)


def test_syncbn_matches_full_batch_bn(rng):
    mesh = create_mesh(data=8, context=1)
    x = jnp.array(rng.normal(size=(16, 4, 4, 8), scale=3.0), jnp.float32)

    sync_net = BNNet(sync=True)
    plain_net = BNNet(sync=False)
    variables = plain_net.init(jax.random.PRNGKey(0), x)

    # reference: plain BN over the WHOLE batch on one device
    want, _ = plain_net.apply(variables, x, mutable=["batch_stats"])

    # sharded: each device sees 2 samples; syncbn pmean's the moments
    def step(v, xs):
        out, _ = sync_net.apply(v, xs, mutable=["batch_stats"])
        return out

    sharded = jax.jit(jax.shard_map(
        functools.partial(step, variables), mesh=mesh,
        in_specs=P("data"), out_specs=P("data"), check_vma=False))
    got = sharded(x)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-5, atol=2e-5)

    # sanity: per-shard UNsynced BN differs (so the pmean is load-bearing)
    unsynced = jax.jit(jax.shard_map(
        functools.partial(
            lambda v, xs: plain_net.apply(v, xs, mutable=["batch_stats"])[0],
            variables),
        mesh=mesh, in_specs=P("data"), out_specs=P("data"), check_vma=False))
    diff = np.abs(np.asarray(unsynced(x)) - np.asarray(want)).max()
    assert diff > 1e-3
