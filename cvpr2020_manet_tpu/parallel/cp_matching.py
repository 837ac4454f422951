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


def ring_local_then_min(query, ref_shard, onehot_shard, valid_shard,
                        axis_name):
    """Ring-schedule variant (SURVEY.md §3.3 'ring attention' row): instead
    of one all-gather of partial results, the memory SHARDS rotate around
    the ring (lax.ppermute) while each device folds a running min —
    communication of the next shard overlaps with matching on the current
    one under XLA's scheduler. Same result as `local_then_min`; preferable
    when shards are large (1080p paged memory) since no (ctx, Nq, O)
    gather buffer is materialized.
    """
    n = jax.lax.axis_size(axis_name)
    perm = [(i, (i + 1) % n) for i in range(n)]

    def body(i, carry):
        ref, oh, valid, dmin = carry
        d = M.global_matching(query, ref, oh, valid, normalize=False)
        dmin = jnp.minimum(dmin, d)
        ref = jax.lax.ppermute(ref, axis_name, perm)
        oh = jax.lax.ppermute(oh, axis_name, perm)
        valid = jax.lax.ppermute(valid, axis_name, perm)
        return ref, oh, valid, dmin

    o = onehot_shard.shape[1]
    init = (ref_shard, onehot_shard, valid_shard.astype(jnp.float32),
            jnp.full((query.shape[0], o), M.WRONG_LABEL_PADDING_DISTANCE,
                     jnp.float32))
    *_, dmin = jax.lax.fori_loop(0, n, body, init)
    return M.normalize_distance(dmin)


def context_parallel_matching(
    query: jax.Array,       # (Nq, C)
    ref: jax.Array,         # (Nk, C) — Nk divisible by the context size
    ref_onehot: jax.Array,  # (Nk, O)
    ref_valid: jax.Array,   # (Nk,)
    mesh: Mesh,
    axis_name: str = "context",
    schedule: str = "allgather",     # "allgather" | "ring"
) -> jax.Array:
    """Standalone CP matching over `mesh[axis_name]` (for eval / tests)."""
    impl = local_then_min if schedule == "allgather" else ring_local_then_min
    fn = shard_map(
        functools.partial(impl, axis_name=axis_name),
        mesh=mesh,
        in_specs=(P(), P(axis_name), P(axis_name), P(axis_name)),
        out_specs=P(),
        check_vma=False,
    )
    return fn(query, ref, ref_onehot, ref_valid)
