"""Context-parallel global matching (SURVEY.md §3.3 SP/CP row).

The reference has no sequence parallelism — it bounds the O(HW x HW)
matching by Python-loop chunking on one GPU. TPU-native, the memory-pixel
axis shards across chips over the 'context' mesh axis: each chip computes
per-object min-distance maps over ITS shard of reference pixels, then the
shards combine with an all-gather + min over the tiny (Nq, O) results —
an all-reduce-min that rides ICI. This is the scaling story for unbounded
memory growth / 1080p streaming (BASELINE config 5): memory capacity and
matching FLOPs both scale linearly with the context axis.

Backend composition: each shard's matching runs on the selected backend —
the jnp oracle or the production Pallas kernel (ops/matching_pallas) —
so CP composes with the kernel that actually ships on TPU. The combine
is exact on NORMALIZED distances: `normalize_distance` is monotone
non-decreasing, so min-of-normalized == normalize-of-min elementwise, and
the Pallas kernel (which normalizes at finalize) needs no un-normalized
escape hatch.

Differentiability: all_gather + min is differentiable, so the same path
serves CP *training* through the hard min, matching the reference's
train-through-min semantics (SURVEY.md §8 hard parts).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P
from jax import shard_map

from cvpr2020_manet_tpu.ops import matching as M


def _shard_matching(query, ref, onehot, valid, backend: str):
    """One shard's per-object min-distance maps, NORMALIZED. (Nq, O)."""
    if backend == "jnp":
        return M.global_matching(query, ref, onehot, valid)
    from cvpr2020_manet_tpu.ops.matching_pallas import global_matching_pallas
    return global_matching_pallas(
        query, ref, onehot, valid,
        interpret=(backend == "pallas_interpret"))


def local_then_min(query, ref_shard, onehot_shard, valid_shard, axis_name,
                   backend: str = "jnp"):
    """Per-shard matching + cross-shard min. Call INSIDE shard_map/pmap.

    query (Nq, C) replicated; ref/onehot/valid sharded on pixel axis.
    Returns (Nq, O) — identical on every member of `axis_name`.
    """
    local = _shard_matching(query, ref_shard, onehot_shard, valid_shard,
                            backend)
    gathered = jax.lax.all_gather(local, axis_name)      # (ctx, Nq, O)
    return jnp.min(gathered, axis=0)


def ring_local_then_min(query, ref_shard, onehot_shard, valid_shard,
                        axis_name, backend: str = "jnp"):
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
        d = _shard_matching(query, ref, oh, valid, backend)
        dmin = jnp.minimum(dmin, d)
        ref = jax.lax.ppermute(ref, axis_name, perm)
        oh = jax.lax.ppermute(oh, axis_name, perm)
        valid = jax.lax.ppermute(valid, axis_name, perm)
        return ref, oh, valid, dmin

    o = onehot_shard.shape[1]
    # running min folds in NORMALIZED space: empty/invalid saturate at 1.0
    init = (ref_shard, onehot_shard, valid_shard.astype(jnp.float32),
            jnp.ones((query.shape[0], o), jnp.float32))
    *_, dmin = jax.lax.fori_loop(0, n, body, init)
    return dmin


def ring_pallas(query, ref_shard, onehot_shard, valid_shard, axis_name,
                backend: str = "pallas"):
    """Kernel-level ring schedule: the bucketed shards rotate via
    inter-chip RDMA INSIDE one Pallas kernel (ops/ring_matching_pallas),
    the send overlapping each step's full matching pass — no per-fold
    XLA collective, no gather buffer. Call INSIDE shard_map.

    The schedule IS the Pallas kernel, so `backend` only selects
    hardware vs interpreter: anything except an explicit "pallas" runs
    in interpret mode off-TPU (the default backend="jnp" would otherwise
    try to lower TPU RDMA ops for the CPU mesh and crash)."""
    from cvpr2020_manet_tpu.ops.ring_matching_pallas import (
        ring_matching_shard)
    oh = onehot_shard * valid_shard.astype(onehot_shard.dtype)[:, None]
    interp = (backend != "pallas"
              and jax.default_backend() != "tpu") or \
        backend == "pallas_interpret"
    return ring_matching_shard(
        query, ref_shard, oh, axis_name=axis_name, interpret=interp)


def context_parallel_matching(
    query: jax.Array,       # (Nq, C)
    ref: jax.Array,         # (Nk, C) — Nk divisible by the context size
    ref_onehot: jax.Array,  # (Nk, O)
    ref_valid: jax.Array,   # (Nk,)
    mesh: Mesh,
    axis_name: str = "context",
    schedule: str = "allgather",  # "allgather" | "ring" | "ring_pallas"
    backend: str = "jnp",         # "jnp" | "pallas" | "pallas_interpret"
) -> jax.Array:
    """Standalone CP matching over `mesh[axis_name]` (eval / tests).

    `backend` selects the per-shard matching implementation — pass
    "pallas" on a TPU mesh so the CP path exercises the production kernel
    (each shard buckets its own rows via prepare_ref inside the call).
    schedule="ring_pallas" moves the whole ring inside the RDMA Pallas
    kernel (backend is then forced to the Pallas kernel).
    """
    impl = {"allgather": local_then_min, "ring": ring_local_then_min,
            "ring_pallas": ring_pallas}[schedule]
    fn = shard_map(
        functools.partial(impl, axis_name=axis_name, backend=backend),
        mesh=mesh,
        in_specs=(P(), P(axis_name), P(axis_name), P(axis_name)),
        out_specs=P(),
        check_vma=False,
    )
    return fn(query, ref, ref_onehot, ref_valid)


def cp_backend(use_pallas: bool, interpret: bool) -> str:
    """Per-shard backend string for an engine's resolved matching mode
    (shared by Evaluator / StreamingIVOS __init__)."""
    return ("pallas_interpret" if interpret
            else "pallas" if use_pallas else "jnp")


def cp_match_flat(query_flat: jax.Array, ref: jax.Array,
                  ref_onehot: jax.Array, mesh: Mesh,
                  backend: str) -> jax.Array:
    """The engines' shared CP call shape (evaluator round/sweep,
    streaming observe): flattened queries against an all-rows-valid
    reference — validity is already folded into `ref_onehot` by the
    engines' memory layouts. -> (Nq, O) normalized distances; callers
    reshape to their spatial grid."""
    return context_parallel_matching(
        query_flat, ref, ref_onehot,
        jnp.ones((ref.shape[0],), jnp.float32), mesh, backend=backend)
