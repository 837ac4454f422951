"""Pallas RDMA ring-schedule global matching (SURVEY.md §3.3 'ring
attention' row; pallas guide §10/§18).

`parallel/cp_matching.ring_local_then_min` rotates memory shards with
XLA-level `lax.ppermute` — one collective per fold, with XLA scheduling
the overlap. This kernel moves the ring INSIDE Pallas: each device's
bucketed memory shard (ops/matching_pallas.prepare_ref layout — the
production single-chip kernel's layout) rotates around the 'context'
ring via inter-chip RDMA (`pltpu.make_async_remote_copy`), started at
the top of each ring step so the transfer of shard s+1 overlaps the
entire matching pass over shard s. No (ctx, Nq, O) gather buffer ever
materializes, and the accumulator never leaves the chip.

Synchronization (double-buffered + per-slot consumed handshake):
- two HBM buffers per rotating array; step s reads slot s%2 while the
  neighbor's payload lands in slot (s+1)%2;
- send started at grid (s, 0, 0) AFTER the right neighbor's "I finished
  the step that read your destination slot" signal (a remote REGULAR
  semaphore, indexed by slot parity); send-completion waited at the END
  of step s, then the signal to OUR left neighbor is emitted. A plain
  nearest-neighbor barrier is NOT enough here: on rings of n >= 3 a fast
  device can bank both neighbor signals a step early and slide a full
  step ahead, overwriting a slot still being read (observed as wrong
  minima in the 1x4 interpret test before the handshake).

Intra-step k-tile streaming is double-buffered (guide §9 two-slot DMA
pattern): tile j+1's ANY->VMEM copies start before tile j's wait, so
the next tile's transfer rides under the current tile's dot+min.
Sequential grid iterations make the slot reuse safe: by the time
iteration j runs, iteration j-1's reads of slot (j-1)%2 are complete.
The overlap itself can only be MEASURED on real multi-chip hardware;
this sandbox has one chip, so the kernel is validated for correctness
in interpret mode (`pltpu.InterpretParams` simulates the remote DMAs
on a CPU mesh).

Ref: the reference bounds matching memory by Python-loop chunking on one
GPU (ref:networks/IntVOS.py global_matching_for_eval, expected); it has
no multi-device matching at all.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from cvpr2020_manet_tpu.ops.matching import WRONG_LABEL_PADDING_DISTANCE
from cvpr2020_manet_tpu.ops.matching_pallas import (
    DEFAULT_TK, DEFAULT_TQ, _round_up, prepare_ref)


def _ring_kernel(dev_ref,                       # SMEM prefetch: ring coords
                 q_ref, lneg2_ref, lsq_ref, lobj_ref,   # inputs
                 out_ref,                        # output (TQ, o_pad)
                 # mutable HBM state, declared as (discarded) ANY outputs —
                 # interpret mode requires ANY buffers to be kernel
                 # inputs/outputs, and RDMA destinations must be mutable:
                 buf_neg2, buf_sq, buf_obj,      # rotating buffers (2, ...)
                 acc_hbm,                        # (NQB, o_pad, TQ)
                 acc_vmem, k_vmem, kn_vmem, oh_vmem,
                 local_sem, acc_sem, tile_sems,
                 send_sems, recv_sems, ready_sems,
                 *, n_steps, axis_name):
    s = pl.program_id(0)
    i = pl.program_id(1)
    j = pl.program_id(2)
    nqb = pl.num_programs(1)
    nkb = pl.num_programs(2)
    slot = jax.lax.rem(s, 2)
    nslot = jax.lax.rem(s + 1, 2)

    # MESH device ids: {ring axis: coord}, other mesh axes implicit (self)
    dev_id = lambda coord: {axis_name: coord}
    right = dev_ref[0]
    left = dev_ref[1]

    def rdma(src, dst, to_slot, k, coord):
        # send/recv semaphores are PER destination slot (guide §18 ring
        # pattern): two in-flight transfers of consecutive steps must not
        # credit the same DMA semaphore, or a byte-count wait can be
        # satisfied by the wrong transfer's partial arrival
        return pltpu.make_async_remote_copy(
            src_ref=src, dst_ref=dst,
            send_sem=send_sems.at[to_slot * 3 + k],
            recv_sem=recv_sems.at[to_slot * 3 + k],
            device_id=dev_id(coord),
            device_id_type=pltpu.DeviceIdType.MESH)

    def step_copies(from_slot, to_slot, coord):
        return (rdma(buf_neg2.at[from_slot], buf_neg2.at[to_slot],
                     to_slot, 0, coord),
                rdma(buf_sq.at[from_slot], buf_sq.at[to_slot],
                     to_slot, 1, coord),
                rdma(buf_obj.at[from_slot], buf_obj.at[to_slot],
                     to_slot, 2, coord))

    # ---- step head: seed / receive the rotating shard, start the next send
    @pl.when((i == 0) & (j == 0))
    def _step_head():
        @pl.when(s == 0)
        def _seed_local():
            for src, dst in ((lneg2_ref, buf_neg2.at[0]),
                             (lsq_ref, buf_sq.at[0]),
                             (lobj_ref, buf_obj.at[0])):
                cp = pltpu.make_async_copy(src, dst, local_sem)
                cp.start()
                cp.wait()

        @pl.when(s > 0)
        def _wait_recv():
            # the left neighbor's RDMA into our slot s%2 (started at its
            # step s-1); waiting recreates the matching descriptors
            for cp in step_copies(nslot, slot, right):
                cp.wait_recv()

        @pl.when(s < n_steps - 1)
        def _start_send():
            @pl.when(s > 0)
            def _wait_dst_free():
                # right neighbor finished the step that read our
                # destination slot (its step s-1 read slot (s-1)%2 ==
                # our send target (s+1)%2)
                pltpu.semaphore_wait(ready_sems.at[nslot], 1)

            for cp in step_copies(slot, nslot, right):
                cp.start()

    # ---- accumulator load for this q block
    @pl.when(j == 0)
    def _acc_load():
        @pl.when(s == 0)
        def _init():
            acc_vmem[:] = jnp.full_like(acc_vmem,
                                        WRONG_LABEL_PADDING_DISTANCE)

        @pl.when(s > 0)
        def _load():
            cp = pltpu.make_async_copy(acc_hbm.at[i], acc_vmem, acc_sem)
            cp.start()
            cp.wait()

    # ---- matching tile: stream k block j of the current shard, double-
    # buffered (guide §9): tile j+1's copies start BEFORE tile j's wait,
    # overlapping the next transfer with this tile's dot+min. Slot reuse
    # is safe because grid iterations are sequential: iteration j-1's
    # reads of slot (j-1)%2 completed before this iteration started.
    bk = k_vmem.shape[1]
    jslot = jax.lax.rem(j, 2)
    jnext = jax.lax.rem(j + 1, 2)

    def tile_copies(jj, sl):
        return (
            pltpu.make_async_copy(buf_neg2.at[slot, pl.ds(jj * bk, bk), :],
                                  k_vmem.at[sl], tile_sems.at[sl, 0]),
            pltpu.make_async_copy(buf_sq.at[slot, pl.ds(jj, 1), :],
                                  kn_vmem.at[sl], tile_sems.at[sl, 1]),
            pltpu.make_async_copy(buf_obj.at[slot, pl.ds(jj, 1), :],
                                  oh_vmem.at[sl], tile_sems.at[sl, 2]),
        )

    @pl.when(j == 0)
    def _tile_warmup():
        for cp in tile_copies(0, 0):
            cp.start()

    @pl.when(j + 1 < nkb)
    def _tile_prefetch():
        for cp in tile_copies(j + 1, jnext):
            cp.start()

    for cp in tile_copies(j, jslot):
        cp.wait()

    cross2 = jax.lax.dot_general(
        q_ref[:], k_vmem[jslot], dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32)
    e = cross2 + kn_vmem[jslot, 0, :][None, :]
    dmin = jnp.min(e, axis=1)                            # (TQ,)
    ohrow = oh_vmem[jslot, 0, :]                         # (o_pad,)
    upd = jnp.where(ohrow[:, None] > 0, dmin[None, :],
                    WRONG_LABEL_PADDING_DISTANCE)
    acc_vmem[:] = jnp.minimum(acc_vmem[:], upd)

    # ---- accumulator store / final output for this q block
    @pl.when(j == nkb - 1)
    def _acc_store():
        @pl.when(s < n_steps - 1)
        def _spill():
            cp = pltpu.make_async_copy(acc_vmem, acc_hbm.at[i], acc_sem)
            cp.start()
            cp.wait()

        @pl.when(s == n_steps - 1)
        def _finalize():
            q = q_ref[:].astype(jnp.float32)
            qn = jnp.sum(jnp.square(q), axis=-1)         # (TQ,)
            d = jnp.maximum(acc_vmem[:] + qn[None, :], 0.0)
            d = jnp.minimum(d, WRONG_LABEL_PADDING_DISTANCE)
            norm = 1.0 - 2.0 / (1.0 + jnp.exp(jnp.minimum(d, 30.0)))
            out_ref[:] = norm.T

    # ---- step tail: drain our send, then tell the LEFT neighbor (our
    # writer) that slot s%2 is consumed and safe to overwrite
    @pl.when((i == nqb - 1) & (j == nkb - 1) & (s < n_steps - 1))
    def _step_tail():
        for cp in step_copies(slot, nslot, right):
            cp.wait_send()

        @pl.when(s < n_steps - 2)
        def _signal_consumed():
            # approves the left neighbor's send at step s+1 (sends stop
            # after step n-2, so the last step's signal would go
            # unconsumed — skip it)
            pltpu.semaphore_signal(ready_sems.at[slot], inc=1,
                                   device_id=dev_id(left),
                                   device_id_type=pltpu.DeviceIdType.MESH)


def ring_matching_shard(
    query: jax.Array,         # (Nq, C) replicated across the ring
    ref_shard: jax.Array,     # (Ns, C) this device's memory rows
    onehot_shard: jax.Array,  # (Ns, O)
    *,
    axis_name: str = "context",
    block_q: int = DEFAULT_TQ,
    block_k: int = DEFAULT_TK,
    interpret: bool = False,
) -> jax.Array:
    """Ring matching over `axis_name`. Call INSIDE shard_map.

    Each device buckets its own shard (prepare_ref — the production
    kernel's layout), then the bucketed shards rotate around the ring via
    RDMA while a per-device accumulator folds the running min. Returns
    the (Nq, O) NORMALIZED distance maps over ALL shards' rows —
    identical on every ring member, and elementwise equal to
    `ops.matching.global_matching(query, all_rows, ...)`.
    """
    n = jax.lax.axis_size(axis_name)
    bucketed = prepare_ref(ref_shard, onehot_shard, block_k=block_k)
    nq, c = query.shape
    o = bucketed.num_objects
    o_pad = _round_up(o, 8)
    c_pad = bucketed.neg2pixels.shape[1]
    nkb = bucketed.block_obj.shape[0]
    block_q = min(block_q, _round_up(nq, 8))
    nq_pad = _round_up(nq, block_q)
    nqb = nq_pad // block_q
    query = jnp.pad(query, ((0, nq_pad - nq), (0, c_pad - c)))

    # per-block object one-hot rows (rotates with the shard; rows of
    # unused blocks are all-zero -> their tiles fold a no-op)
    obj_oh = ((bucketed.block_obj[:, None]
               == jnp.arange(o_pad, dtype=jnp.int32)[None, :])
              ).astype(jnp.float32)

    my = jax.lax.axis_index(axis_name)
    dev = jnp.stack([(my + 1) % n, (my - 1) % n]).astype(jnp.int32)

    grid = (n, nqb, nkb)
    kernel = functools.partial(_ring_kernel, n_steps=n,
                               axis_name=axis_name)
    any_spec = pl.BlockSpec(memory_space=pl.ANY)
    out, *_state = pl.pallas_call(
        kernel,
        out_shape=(
            jax.ShapeDtypeStruct((nq_pad, o_pad), jnp.float32),
            jax.ShapeDtypeStruct((2, nkb * block_k, c_pad), jnp.float32),
            jax.ShapeDtypeStruct((2, nkb, block_k), jnp.float32),
            jax.ShapeDtypeStruct((2, nkb, o_pad), jnp.float32),
            jax.ShapeDtypeStruct((nqb, o_pad, block_q), jnp.float32),
        ),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=grid,
            in_specs=[
                pl.BlockSpec((block_q, c_pad), lambda s, i, j, d: (i, 0),
                             memory_space=pltpu.VMEM),
                any_spec,   # local neg2
                any_spec,   # local sqnorm
                any_spec,   # local obj one-hot
            ],
            out_specs=(
                pl.BlockSpec((block_q, o_pad), lambda s, i, j, d: (i, 0),
                             memory_space=pltpu.VMEM),
                any_spec, any_spec, any_spec, any_spec,
            ),
            scratch_shapes=[
                pltpu.VMEM((o_pad, block_q), jnp.float32),
                pltpu.VMEM((2, block_k, c_pad), jnp.float32),
                pltpu.VMEM((2, 1, block_k), jnp.float32),
                pltpu.VMEM((2, 1, o_pad), jnp.float32),
                pltpu.SemaphoreType.DMA(()),
                pltpu.SemaphoreType.DMA(()),
                pltpu.SemaphoreType.DMA((2, 3)),   # k-tile double buffer
                pltpu.SemaphoreType.DMA((6,)),
                pltpu.SemaphoreType.DMA((6,)),
                pltpu.SemaphoreType.REGULAR((2,)),
            ],
        ),
        # collective_id MUST be set: without it the interpreter inserts a
        # pre-kernel barrier across ALL host devices, which deadlocks when
        # shard_map runs the kernel on a sub-mesh (observed: 4.5%-CPU hang
        # on an (1,2) ring with 8 virtual devices). Slot safety itself is
        # the per-slot recv/ready handshake, not a barrier semaphore.
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary", "arbitrary"),
            collective_id=7,
        ),
        interpret=(pltpu.InterpretParams() if interpret else False),
    )(dev, query,
      bucketed.neg2pixels.astype(jnp.float32),
      bucketed.sqnorm,
      obj_oh)
    return out[:nq, :o]
