"""Context-parallel global matching (SURVEY.md §3.3 SP/CP row).

The reference has no sequence parallelism — it bounds the O(HW x HW)
matching by Python-loop chunking on one GPU. TPU-native, the memory-pixel
axis shards across chips over the 'context' mesh axis: each chip computes
per-object min-distance maps over ITS shard of reference pixels, then the
shards combine with an all-gather + min over the tiny (Nq, O) results —
an all-reduce-min that rides ICI. This is the scaling story for unbounded
memory growth / 1080p streaming (BASELINE config 5): memory capacity and
matching FLOPs both scale linearly with the context axis.

`shard_min_combine` is differentiable (all_gather + min), so the same
path serves CP *training* through the hard min, matching the reference's
train-through-min semantics (SURVEY.md §8 hard parts).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P
from jax import shard_map

from cvpr2020_manet_tpu.ops import matching as M


def local_then_min(query, ref_shard, onehot_shard, valid_shard, axis_name):
    """Per-shard matching + cross-shard min. Call INSIDE shard_map/pmap.

    query (Nq, C) replicated; ref/onehot/valid sharded on pixel axis.
    Returns (Nq, O) — identical on every member of `axis_name`.
    """
    local = M.global_matching(query, ref_shard, onehot_shard, valid_shard,
                              normalize=False)
    gathered = jax.lax.all_gather(local, axis_name)      # (ctx, Nq, O)
    return M.normalize_distance(jnp.min(gathered, axis=0))


def context_parallel_matching(
    query: jax.Array,       # (Nq, C)
    ref: jax.Array,         # (Nk, C) — Nk divisible by the context size
    ref_onehot: jax.Array,  # (Nk, O)
    ref_valid: jax.Array,   # (Nk,)
    mesh: Mesh,
    axis_name: str = "context",
) -> jax.Array:
    """Standalone CP matching over `mesh[axis_name]` (for eval / tests)."""
    fn = shard_map(
        functools.partial(local_then_min, axis_name=axis_name),
        mesh=mesh,
        in_specs=(P(), P(axis_name), P(axis_name), P(axis_name)),
        out_specs=P(),
        check_vma=False,
    )
    return fn(query, ref, ref_onehot, ref_valid)
