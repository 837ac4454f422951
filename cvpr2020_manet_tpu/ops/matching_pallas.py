"""Fused Pallas TPU kernel for global matching (SURVEY.md C3' / §8 PR2).

The reference's hot loop (ref:networks/IntVOS.py global_matching_for_eval,
expected) is an O(HW_q x HW_k x C) pairwise-distance + per-object min,
chunked in Python on GPU. TPU-native it becomes a fused streaming kernel
with the flash-attention skeleton — but with a running **min** instead of
an online softmax (min is associative; no rescaling pass needed).

Kernel-shaping decisions (each measured on v5e):

1. **Bucketed layout.** A naive kernel masks the distance tile once per
   object — O(TQ*TK*O) VPU work that swamps the MXU (measured
   3.5 TFLOP/s). `prepare_ref` sorts reference pixels by object label ONCE
   per round (cheap XLA sort/scatter, amortized over the whole frame
   sweep) so every k-block belongs to exactly one object; the kernel does
   ONE unmasked min per tile and folds it into that object's accumulator
   row.

2. **Distance algebra hoisted out of the hot loop.** Since
   min_k(|q|^2 + |k|^2 - 2qk) = |q|^2 + min_k(|k|^2 - 2qk), the kernel
   streams e = (q @ (-2k)^T) + |k|^2 — |k|^2 and the -2 scaling are
   precomputed per round in `prepare_ref` — and adds |q|^2 once at
   finalize. VPU work per tile drops from ~5 passes to 2 (one broadcast
   add, one min-reduce); the MXU matmul becomes the limiter.

3. **Tall q blocks** (TQ=1024): HBM traffic is dominated by re-reading the
   reference per q-block; quadrupling TQ quarters it.

Padding contract:
  C -> multiple of 128 with zeros (adds 0 to every distance);
  per-object pixel lists -> multiples of TK, padded with sentinel rows
  (embedding 0, |k|^2 = 1e8) that can never win the min;
  objects with no pixels get no blocks and saturate at distance 1.0.

The distance matrix never touches HBM: traffic is O(Nq*C + NKB*TK*C +
Nq*O) instead of O(Nq*Nk).
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from cvpr2020_manet_tpu.ops.matching import WRONG_LABEL_PADDING_DISTANCE

DEFAULT_TQ = 1024
DEFAULT_TK = 512


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


@jax.tree_util.register_pytree_node_class
class BucketedRef(NamedTuple):
    """Reference memory sorted into per-object blocks (device arrays).

    `num_objects` is static metadata (kept out of the traced leaves so the
    kernel's output shape stays concrete under jit).
    """
    neg2pixels: jax.Array  # (NKB * TK, C) = -2 * embeddings, object-contiguous
    sqnorm: jax.Array      # (NKB, TK) f32 = |k|^2 (1e8 on padding rows)
    block_obj: jax.Array   # (NKB,) int32: object id of each k-block
    src_idx: jax.Array     # (NKB * TK,) int32: original ref index (-1 = pad)
    num_objects: int       # original (unpadded) object count — static

    def tree_flatten(self):
        return ((self.neg2pixels, self.sqnorm, self.block_obj, self.src_idx),
                self.num_objects)

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(*children, aux)


@jax.tree_util.register_pytree_node_class
class BucketedRefInt8(NamedTuple):
    """Int8-quantized bucketed reference (opt-in serving mode).

    Same layout as `BucketedRef`, but pixels are symmetric int8
    (`k = scale * pixels`) so the kernel's cross term runs on the MXU's
    int8 path (2x the bf16 peak on v5e); `sqnorm` already carries the
    scale^2 so distances come out in the ORIGINAL embedding space:
    d = |s_q*q_hat|^2 + |s_k*k_hat|^2 - 2*s_q*s_k*(q_hat . k_hat)
    — exactly the f32 distance between the quantized vectors, hence
    always >= 0 and exactly reproducible by the jnp oracle on the
    dequantized embeddings (pinned in tests/test_pallas_matching.py).
    """
    pixels: jax.Array      # (NKB * TK, C) int8, object-contiguous
    sqnorm: jax.Array      # (NKB, TK) f32 = scale^2*|k_hat|^2 (1e8 on pads)
    block_obj: jax.Array   # (NKB,) int32
    src_idx: jax.Array     # (NKB * TK,) int32 (-1 = pad)
    scale: jax.Array       # () f32 symmetric quantization scale
    num_objects: int       # static

    def tree_flatten(self):
        return ((self.pixels, self.sqnorm, self.block_obj, self.src_idx,
                 self.scale), self.num_objects)

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(*children, aux)


def _bucket_layout(ref_onehot: jax.Array, ref_valid: jax.Array | None,
                   block_k: int):
    """Shared per-object bucketing of reference pixels (jittable).

    Returns (src_idx (NKB*TK,) int32 with -1 on padding rows,
    block_obj (NKB,) int32 with the o_pad sentinel on slack blocks,
    nkb, o, o_pad)."""
    nk, o = ref_onehot.shape
    o_pad = _round_up(o, 8)
    nkb = _round_up(nk, block_k) // block_k + o_pad   # static upper bound

    gate = ref_onehot.astype(jnp.float32)
    if ref_valid is not None:
        gate = gate * ref_valid.astype(jnp.float32)[:, None]
    has_obj = jnp.max(gate, axis=1) > 0
    labels = jnp.where(has_obj, jnp.argmax(gate, axis=1), o_pad)  # sentinel

    counts = jnp.sum(jax.nn.one_hot(labels, o_pad, dtype=jnp.int32), axis=0)
    blk_per_obj = (counts + block_k - 1) // block_k
    start_blk = jnp.concatenate(
        [jnp.zeros((1,), jnp.int32), jnp.cumsum(blk_per_obj)[:-1]])
    seg_start = jnp.concatenate(
        [jnp.zeros((1,), jnp.int32), jnp.cumsum(counts)[:-1]])

    order = jnp.argsort(labels, stable=True)
    lab_sorted = labels[order]
    rank = jnp.arange(nk, dtype=jnp.int32)
    # destination row of each sorted pixel inside the bucketed layout
    lab_c = jnp.clip(lab_sorted, 0, o_pad - 1)
    dest = start_blk[lab_c] * block_k + (rank - seg_start[lab_c])
    dest = jnp.where(lab_sorted >= o_pad, nkb * block_k, dest)  # dropped

    # ONE narrow int32 scatter builds the inverse map (dest row -> source
    # pixel); the wide (rows x c_pad) tables are then built with GATHERS.
    # Measured (chip, two-point slope timing, scripts/profile_stages.py):
    # 0.36 ms vs 0.43 ms for the wide row-scatter formulation and 0.69 ms
    # for a sort-free cumsum-rank variant — row gathers beat row scatters
    # on TPU, and the Nk-long int cumsum loses to the bitonic argsort.
    src_idx = jnp.full((nkb * block_k,), -1, jnp.int32)
    src_idx = src_idx.at[dest].set(order.astype(jnp.int32), mode="drop")

    blk = jnp.arange(nkb, dtype=jnp.int32)
    total_blocks = jnp.sum(blk_per_obj)
    block_obj = jnp.searchsorted(start_blk, blk, side="right").astype(
        jnp.int32) - 1
    block_obj = jnp.where(blk < total_blocks, block_obj, o_pad)  # unused
    return src_idx, block_obj, nkb, o, o_pad


def prepare_ref(
    ref: jax.Array,         # (Nk, C)
    ref_onehot: jax.Array,  # (Nk, O) {0,1}
    ref_valid: jax.Array | None = None,  # (Nk,)
    *,
    block_k: int = DEFAULT_TK,
) -> BucketedRef:
    """Sort reference pixels by object into TK-aligned buckets (jittable).

    Run once per interaction round; its cost is amortized over every
    propagated frame of the sweep.
    """
    nk, c = ref.shape
    c_pad = _round_up(c, 128)
    src_idx, block_obj, nkb, o, _ = _bucket_layout(
        ref_onehot, ref_valid, block_k)

    ref_pad = jnp.pad(ref, ((0, 0), (0, c_pad - c)))
    filled = src_idx >= 0
    gather = jnp.clip(src_idx, 0, nk - 1)
    neg2 = jnp.where(filled[:, None], -2.0 * ref_pad[gather],
                     jnp.zeros((), ref.dtype))
    kn_rows = jnp.sum(jnp.square(ref_pad.astype(jnp.float32)), axis=-1)
    sqnorm = jnp.where(filled, kn_rows[gather],
                       WRONG_LABEL_PADDING_DISTANCE)
    return BucketedRef(neg2pixels=neg2,
                       sqnorm=sqnorm.reshape(nkb, block_k),
                       block_obj=block_obj, src_idx=src_idx, num_objects=o)


def quantize_symmetric_int8(
        x: jax.Array,
        row_mask: jax.Array | None = None) -> tuple[jax.Array, jax.Array]:
    """Symmetric per-tensor int8 quantization: x ~= scale * x_hat.

    `row_mask` (bool, shape (rows,)) restricts the scale statistic to the
    marked rows — rows outside the mask are still quantized (and may
    saturate at ±127), but cannot inflate the scale."""
    x32 = x.astype(jnp.float32)
    stat = x32 if row_mask is None else jnp.where(
        row_mask.astype(bool)[:, None], x32, 0.0)
    scale = jnp.maximum(jnp.max(jnp.abs(stat)), 1e-6) / 127.0
    x_hat = jnp.clip(jnp.round(x32 / scale), -127.0, 127.0).astype(jnp.int8)
    return x_hat, scale


def quantize_rows_int8(x: jax.Array) -> tuple[jax.Array, jax.Array]:
    """Symmetric per-ROW int8 quantization: x[i] ~= scales[i] * x_hat[i].

    Used for the query side: each pixel's quantization depends only on
    its own embedding, so results are independent of how a sweep is
    batched into kernel calls (the segmented round's bitwise-parity
    contract, tests/test_evaluator.py) — and row-local scales are
    tighter than one tensor-wide scale."""
    x32 = x.astype(jnp.float32)
    scales = jnp.maximum(jnp.max(jnp.abs(x32), axis=-1), 1e-6) / 127.0
    x_hat = jnp.clip(jnp.round(x32 / scales[:, None]),
                     -127.0, 127.0).astype(jnp.int8)
    return x_hat, scales


def prepare_ref_int8(
    ref: jax.Array,
    ref_onehot: jax.Array,
    ref_valid: jax.Array | None = None,
    *,
    block_k: int = DEFAULT_TK,
) -> BucketedRefInt8:
    """Int8 variant of `prepare_ref` (symmetric per-tensor scale).

    The scale is computed over the rows that actually enter a bucket
    (labelled and, when `ref_valid` is given, valid): one out-of-
    distribution gated-out pixel must not inflate the scale and coarsen
    quantization of every real key (round-4 advisor finding). Gated-out
    rows are still quantized with that scale — they never reach the
    kernel (the gather below only reads bucketed rows)."""
    nk, c = ref.shape
    c_pad = _round_up(c, 128)
    src_idx, block_obj, nkb, o, _ = _bucket_layout(
        ref_onehot, ref_valid, block_k)

    used = ref_onehot.astype(bool).any(axis=-1)
    if ref_valid is not None:
        used = used & ref_valid.astype(bool)
    k_hat, scale = quantize_symmetric_int8(ref, row_mask=used)
    k_pad = jnp.pad(k_hat, ((0, 0), (0, c_pad - c)))
    filled = src_idx >= 0
    gather = jnp.clip(src_idx, 0, nk - 1)
    pixels = jnp.where(filled[:, None], k_pad[gather],
                       jnp.zeros((), jnp.int8))
    kn_rows = jnp.sum(jnp.square(k_pad.astype(jnp.float32)),
                      axis=-1) * (scale * scale)
    sqnorm = jnp.where(filled, kn_rows[gather],
                       WRONG_LABEL_PADDING_DISTANCE)
    return BucketedRefInt8(pixels=pixels,
                           sqnorm=sqnorm.reshape(nkb, block_k),
                           block_obj=block_obj, src_idx=src_idx,
                           scale=scale, num_objects=o)


def _row_min(e: jax.Array, two_stage: bool) -> jax.Array:
    """min over the key axis of a (TQ, TK) tile.

    two_stage reshapes to (TQ, TK/128, 128) and folds the lane-groups
    elementwise (vreg-wise VPU mins) before ONE 128-lane cross-lane
    reduction — a candidate speedup over the direct lane reduction if
    Mosaic lowers `min(axis=1)` naively; exact same result either way
    (min is associative/commutative). Keep whichever measures faster
    (scripts/bench_matching_kernel.py --two_stage_min)."""
    if not two_stage or e.shape[1] % 128 != 0:
        return jnp.min(e, axis=1)
    er = e.reshape(e.shape[0], e.shape[1] // 128, 128)
    return jnp.min(jnp.min(er, axis=1), axis=-1)


def _matching_kernel(block_obj_ref, q_ref, k2_ref, kn_ref, out_ref, acc_ref,
                     *, two_stage_min: bool = False):
    j = pl.program_id(1)
    nkb = pl.num_programs(1)

    @pl.when(j == 0)
    def _init():
        acc_ref[:] = jnp.full_like(acc_ref, WRONG_LABEL_PADDING_DISTANCE)

    obj = block_obj_ref[j]

    # nkb is a STATIC upper bound (ceil(nk/TK) + o_pad alignment slack);
    # unused slack blocks carry the o_pad sentinel. Skip their dot+min
    # entirely: at training shapes (one 104x104 reference frame) the
    # slack is over half the grid, and the kernel is VPU-bound on the
    # (TQ, TK) min/argmin, so the guard nearly halves kernel time.
    @pl.when(obj < acc_ref.shape[0])
    def _compute():
        # e[q, k] = |k|^2 - 2 q.k  (|q|^2 added at finalize — const in k)
        cross2 = jax.lax.dot_general(
            q_ref[:], k2_ref[:], dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)
        e = cross2 + kn_ref[j, :][None, :]
        dmin = _row_min(e, two_stage_min)           # (TQ,)

        row = jax.lax.broadcasted_iota(jnp.int32, acc_ref.shape, 0)
        upd = jnp.where(row == obj, dmin[None, :],
                        WRONG_LABEL_PADDING_DISTANCE)
        acc_ref[:] = jnp.minimum(acc_ref[:], upd)

    @pl.when(j == nkb - 1)
    def _finalize():
        q = q_ref[:].astype(jnp.float32)
        qn = jnp.sum(jnp.square(q), axis=-1)        # (TQ,)
        d = jnp.maximum(acc_ref[:] + qn[None, :], 0.0)
        d = jnp.minimum(d, WRONG_LABEL_PADDING_DISTANCE)
        norm = 1.0 - 2.0 / (1.0 + jnp.exp(jnp.minimum(d, 30.0)))
        out_ref[:] = norm.T


@functools.partial(
    jax.jit,
    static_argnames=("block_q", "block_k", "interpret", "two_stage_min"))
def global_matching_prepared(
    query: jax.Array,       # (Nq, C)
    bucketed: BucketedRef,
    *,
    block_q: int = DEFAULT_TQ,
    block_k: int = DEFAULT_TK,
    interpret: bool = False,
    two_stage_min: bool = False,
) -> jax.Array:
    """Matching against a prepared (bucketed) reference. -> (Nq, O) f32."""
    nq, c = query.shape
    c_pad = bucketed.neg2pixels.shape[1]
    assert c <= c_pad
    nkb = bucketed.block_obj.shape[0]
    o = bucketed.num_objects
    o_pad = _round_up(o, 8)
    block_q = min(block_q, _round_up(nq, 8))
    nq_pad = _round_up(nq, block_q)
    query = jnp.pad(query, ((0, nq_pad - nq), (0, c_pad - c)))

    grid = (nq_pad // block_q, nkb)
    out = pl.pallas_call(
        functools.partial(_matching_kernel, two_stage_min=two_stage_min),
        out_shape=jax.ShapeDtypeStruct((nq_pad, o_pad), jnp.float32),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=grid,
            in_specs=[
                pl.BlockSpec((block_q, c_pad), lambda i, j, bo: (i, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((block_k, c_pad), lambda i, j, bo: (j, 0),
                             memory_space=pltpu.VMEM),
                # |k|^2 table: small (NKB x TK x 4B), kept whole in VMEM;
                # the kernel dynamically reads row j
                pl.BlockSpec((nkb, block_k), lambda i, j, bo: (0, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((block_q, o_pad), lambda i, j, bo: (i, 0),
                                   memory_space=pltpu.VMEM),
            scratch_shapes=[pltpu.VMEM((o_pad, block_q), jnp.float32)],
        ),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary"),
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * nq_pad * nkb * block_k * c_pad,
            bytes_accessed=(nq_pad * c_pad + nkb * block_k * c_pad
                            + nq_pad * o_pad) * 4,
            transcendentals=nq_pad * o_pad,
        ),
        interpret=interpret,
    )(bucketed.block_obj, query, bucketed.neg2pixels, bucketed.sqnorm)
    return out[:nq, :o]


def _matching_kernel_int8(block_obj_ref, q_ref, k_ref, kn_ref, sc_ref,
                          out_ref, acc_ref):
    """Int8 cross-term variant of `_matching_kernel`.

    q_ref/k_ref are symmetric int8; the dot runs on the MXU's int8 path
    with int32 accumulation (2x the bf16 peak on v5e). The query is
    quantized PER ROW (batch-independent — segment-parity contract);
    sc_ref carries per-row [-2*s_q[i]*s_k, s_q[i]^2] and kn_ref already
    carries s_k^2, so the assembled distance is the exact f32 distance
    between the quantized vectors (always >= 0)."""
    j = pl.program_id(1)
    nkb = pl.num_programs(1)

    @pl.when(j == 0)
    def _init():
        acc_ref[:] = jnp.full_like(acc_ref, WRONG_LABEL_PADDING_DISTANCE)

    obj = block_obj_ref[j]

    @pl.when(obj < acc_ref.shape[0])
    def _compute():
        cross = jax.lax.dot_general(
            q_ref[:], k_ref[:], dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.int32)
        e = (cross.astype(jnp.float32) * sc_ref[:, 0:1]
             + kn_ref[j, :][None, :])
        dmin = jnp.min(e, axis=1)                   # (TQ,)

        row = jax.lax.broadcasted_iota(jnp.int32, acc_ref.shape, 0)
        upd = jnp.where(row == obj, dmin[None, :],
                        WRONG_LABEL_PADDING_DISTANCE)
        acc_ref[:] = jnp.minimum(acc_ref[:], upd)

    @pl.when(j == nkb - 1)
    def _finalize():
        q = q_ref[:].astype(jnp.float32)
        qn = jnp.sum(jnp.square(q), axis=-1) * sc_ref[:, 1]  # (TQ,)
        d = jnp.maximum(acc_ref[:] + qn[None, :], 0.0)
        d = jnp.minimum(d, WRONG_LABEL_PADDING_DISTANCE)
        norm = 1.0 - 2.0 / (1.0 + jnp.exp(jnp.minimum(d, 30.0)))
        out_ref[:] = norm.T


@functools.partial(
    jax.jit, static_argnames=("block_q", "block_k", "interpret"))
def global_matching_prepared_int8(
    query: jax.Array,       # (Nq, C) float
    bucketed: BucketedRefInt8,
    *,
    block_q: int = DEFAULT_TQ,
    block_k: int = DEFAULT_TK,
    interpret: bool = False,
) -> jax.Array:
    """Matching against an int8-bucketed reference. -> (Nq, O) f32.

    The query is quantized here (symmetric PER ROW — see
    quantize_rows_int8); output is in the same normalized-distance space
    as the f32 kernel, up to int8 quantization of the embeddings.

    Measured on-chip (round 5, docs/BENCHMARKS.md "Int8-quantized global
    matching"): 1.014 ms/call slope-timed at the production shape — a
    1.28x kernel speedup over the f32 kernel's 1.294 ms (NOT the 2x MXU
    ratio: only the cross term is int8; the VPU epilogue — per-tile min
    fold, distance assembly, normalize — and the per-call query
    quantization stay f32). Quality cost on the entry task:
    docs/QUALITY.md round-5 int8 study."""
    nq, c = query.shape
    c_pad = bucketed.pixels.shape[1]
    assert c <= c_pad
    nkb = bucketed.block_obj.shape[0]
    o = bucketed.num_objects
    o_pad = _round_up(o, 8)
    block_q = min(block_q, _round_up(nq, 8))
    nq_pad = _round_up(nq, block_q)

    q_hat, s_q = quantize_rows_int8(query)
    q_hat = jnp.pad(q_hat, ((0, nq_pad - nq), (0, c_pad - c)))
    s_q = jnp.pad(s_q, (0, nq_pad - nq))
    scales = jnp.stack([-2.0 * s_q * bucketed.scale, s_q * s_q], axis=-1)

    grid = (nq_pad // block_q, nkb)
    out = pl.pallas_call(
        _matching_kernel_int8,
        out_shape=jax.ShapeDtypeStruct((nq_pad, o_pad), jnp.float32),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=grid,
            in_specs=[
                pl.BlockSpec((block_q, c_pad), lambda i, j, bo: (i, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((block_k, c_pad), lambda i, j, bo: (j, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((nkb, block_k), lambda i, j, bo: (0, 0),
                             memory_space=pltpu.VMEM),
                # per-row assembly scales [-2*s_q*s_k, s_q^2]
                pl.BlockSpec((block_q, 2), lambda i, j, bo: (i, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((block_q, o_pad), lambda i, j, bo: (i, 0),
                                   memory_space=pltpu.VMEM),
            scratch_shapes=[pltpu.VMEM((o_pad, block_q), jnp.float32)],
        ),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary"),
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * nq_pad * nkb * block_k * c_pad,
            bytes_accessed=(nq_pad * c_pad + nkb * block_k * c_pad
                            + nq_pad * o_pad * 4),
            transcendentals=nq_pad * o_pad,
        ),
        interpret=interpret,
    )(bucketed.block_obj, q_hat, bucketed.pixels, bucketed.sqnorm, scales)
    return out[:nq, :o]


@functools.partial(
    jax.jit, static_argnames=("block_q", "block_k", "interpret"))
def global_matching_pallas_int8(
    query: jax.Array,
    ref: jax.Array,
    ref_onehot: jax.Array,
    ref_valid: jax.Array | None = None,
    *,
    block_q: int = DEFAULT_TQ,
    block_k: int = DEFAULT_TK,
    interpret: bool = False,
) -> jax.Array:
    """Int8 drop-in for `global_matching_pallas` (opt-in serving mode)."""
    bucketed = prepare_ref_int8(ref, ref_onehot, ref_valid, block_k=block_k)
    return global_matching_prepared_int8(
        query, bucketed, block_q=block_q, block_k=block_k,
        interpret=interpret)


def _matching_kernel_argmin(block_obj_ref, q_ref, k2_ref, kn_ref,
                            out_ref, idx_ref, acc_ref, amin_ref):
    """As _matching_kernel, additionally tracking the winning key's row in
    the bucketed layout (for the custom VJP's argmin-routed gradients)."""
    j = pl.program_id(1)
    nkb = pl.num_programs(1)
    tk = k2_ref.shape[0]

    @pl.when(j == 0)
    def _init():
        acc_ref[:] = jnp.full_like(acc_ref, WRONG_LABEL_PADDING_DISTANCE)
        amin_ref[:] = jnp.full_like(amin_ref, -1)

    obj = block_obj_ref[j]

    # skip unused alignment-slack blocks (see _matching_kernel)
    @pl.when(obj < acc_ref.shape[0])
    def _compute():
        cross2 = jax.lax.dot_general(
            q_ref[:], k2_ref[:], dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)
        e = cross2 + kn_ref[j, :][None, :]
        dmin = jnp.min(e, axis=1)                   # (TQ,)
        am = jnp.argmin(e, axis=1).astype(jnp.int32) + j * tk

        row = jax.lax.broadcasted_iota(jnp.int32, acc_ref.shape, 0)
        better = (row == obj) & (dmin[None, :] < acc_ref[:])
        acc_ref[:] = jnp.where(better, dmin[None, :], acc_ref[:])
        amin_ref[:] = jnp.where(better, am[None, :], amin_ref[:])

    @pl.when(j == nkb - 1)
    def _finalize():
        q = q_ref[:].astype(jnp.float32)
        qn = jnp.sum(jnp.square(q), axis=-1)
        d = jnp.maximum(acc_ref[:] + qn[None, :], 0.0)
        d = jnp.minimum(d, WRONG_LABEL_PADDING_DISTANCE)
        norm = 1.0 - 2.0 / (1.0 + jnp.exp(jnp.minimum(d, 30.0)))
        out_ref[:] = norm.T
        idx_ref[:] = amin_ref[:].T


@functools.partial(
    jax.jit, static_argnames=("block_q", "block_k", "interpret"))
def global_matching_prepared_argmin(
    query: jax.Array, bucketed: BucketedRef, *,
    block_q: int = DEFAULT_TQ, block_k: int = DEFAULT_TK,
    interpret: bool = False,
):
    """-> (distances (Nq, O) f32, argmin rows in bucketed layout (Nq, O))."""
    nq, c = query.shape
    c_pad = bucketed.neg2pixels.shape[1]
    nkb = bucketed.block_obj.shape[0]
    o = bucketed.num_objects
    o_pad = _round_up(o, 8)
    block_q = min(block_q, _round_up(nq, 8))
    nq_pad = _round_up(nq, block_q)
    query = jnp.pad(query, ((0, nq_pad - nq), (0, c_pad - c)))

    grid = (nq_pad // block_q, nkb)
    spec = dict(memory_space=pltpu.VMEM)
    out, idx = pl.pallas_call(
        _matching_kernel_argmin,
        out_shape=(jax.ShapeDtypeStruct((nq_pad, o_pad), jnp.float32),
                   jax.ShapeDtypeStruct((nq_pad, o_pad), jnp.int32)),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=grid,
            in_specs=[
                pl.BlockSpec((block_q, c_pad), lambda i, j, bo: (i, 0), **spec),
                pl.BlockSpec((block_k, c_pad), lambda i, j, bo: (j, 0), **spec),
                pl.BlockSpec((nkb, block_k), lambda i, j, bo: (0, 0), **spec),
            ],
            out_specs=(
                pl.BlockSpec((block_q, o_pad), lambda i, j, bo: (i, 0), **spec),
                pl.BlockSpec((block_q, o_pad), lambda i, j, bo: (i, 0), **spec),
            ),
            scratch_shapes=[pltpu.VMEM((o_pad, block_q), jnp.float32),
                            pltpu.VMEM((o_pad, block_q), jnp.int32)],
        ),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary")),
        interpret=interpret,
    )(bucketed.block_obj, query, bucketed.neg2pixels, bucketed.sqnorm)
    return out[:nq, :o], idx[:nq, :o]


@jax.custom_vjp
def global_matching_trainable(query, ref, ref_onehot):
    """Differentiable Pallas global matching (SURVEY.md §8 hard parts:
    the reference trains THROUGH the hard min; gradients route to the
    winning reference pixel — argmin routing — exactly the subgradient the
    jnp oracle's min produces)."""
    bucketed = prepare_ref(ref, ref_onehot)
    out, _ = global_matching_prepared_argmin(query, bucketed)
    return out


def _gm_train_fwd(query, ref, ref_onehot):
    bucketed = prepare_ref(ref, ref_onehot)
    out, amin_b = global_matching_prepared_argmin(query, bucketed)
    amin = jnp.where(amin_b >= 0, bucketed.src_idx[amin_b], -1)  # (Nq, O)
    return out, (query, ref, amin)


def _gm_train_bwd(res, g):
    query, ref, amin = res
    nq, o = amin.shape
    nk = ref.shape[0]
    q32 = query.astype(jnp.float32)
    k32 = ref.astype(jnp.float32)
    k_a = jnp.take(k32, jnp.clip(amin, 0, nk - 1), axis=0)   # (Nq, O, C)
    diff = q32[:, None, :] - k_a
    d = jnp.sum(jnp.square(diff), axis=-1)                   # (Nq, O)
    # d(norm)/dd = 2 sigmoid(d) sigmoid(-d); clamp region (d >= 30) and
    # empty objects (amin < 0) get exactly zero gradient
    sig = jax.nn.sigmoid(d)
    deriv = 2.0 * sig * (1.0 - sig)
    gd = g * deriv * ((amin >= 0) & (d < 30.0))
    gq = jnp.sum(2.0 * diff * gd[..., None], axis=1)         # (Nq, C)
    scatter_idx = jnp.where(amin >= 0, amin, nk)             # drop invalid
    gk = jnp.zeros((nk, ref.shape[1]), jnp.float32).at[
        scatter_idx.reshape(-1)].add(
        (-2.0 * diff * gd[..., None]).reshape(-1, ref.shape[1]),
        mode="drop")
    g_onehot = jnp.zeros((nk, o), jnp.float32)   # labels: no gradient
    return (gq.astype(query.dtype), gk.astype(ref.dtype), g_onehot)


global_matching_trainable.defvjp(_gm_train_fwd, _gm_train_bwd)


@functools.partial(
    jax.jit, static_argnames=("block_q", "block_k", "interpret"))
def global_matching_pallas(
    query: jax.Array,
    ref: jax.Array,
    ref_onehot: jax.Array,
    ref_valid: jax.Array | None = None,
    *,
    block_q: int = DEFAULT_TQ,
    block_k: int = DEFAULT_TK,
    interpret: bool = False,
) -> jax.Array:
    """Drop-in replacement for ops.matching.global_matching (normalized)."""
    bucketed = prepare_ref(ref, ref_onehot, ref_valid, block_k=block_k)
    return global_matching_prepared(
        query, bucketed, block_q=block_q, block_k=block_k,
        interpret=interpret)
