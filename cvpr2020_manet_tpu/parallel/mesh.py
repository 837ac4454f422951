"""Device mesh + sharding utilities (SURVEY.md §3.3).

The reference's parallelism is single-node `nn.DataParallel` + vendored
SyncBN (ref:networks/deeplab/sync_batchnorm/, expected) — Python-thread
scatter/gather over local GPUs. TPU-native the same capabilities are mesh
axes + named shardings; XLA inserts the collectives (which ride ICI):

  'data'    — batch sharding for training (replaces DataParallel)
  'context' — reference-pixel sharding for global matching at scale:
              each chip computes partial min-distance maps over its memory
              shard, combined with an all-reduce-min (jnp.min over psum'd
              stacks / lax.pmin) — the CP answer to unbounded memory
              (BASELINE config 5).
"""

from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def create_mesh(data: int = -1, context: int = 1,
                devices=None) -> Mesh:
    """Build a ('data', 'context') mesh. data=-1 uses all remaining devices."""
    devices = devices if devices is not None else jax.devices()
    n = len(devices)
    if data == -1:
        assert n % context == 0, (n, context)
        data = n // context
    assert data * context <= n
    dev = np.asarray(devices[:data * context]).reshape(data, context)
    return Mesh(dev, axis_names=("data", "context"))


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Shard axis 0 (batch) over 'data', replicate the rest."""
    return NamedSharding(mesh, P("data"))


def context_sharding(mesh: Mesh) -> NamedSharding:
    """Shard axis 0 (reference pixels) over 'context'."""
    return NamedSharding(mesh, P("context"))


def replicated_sharding(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())
