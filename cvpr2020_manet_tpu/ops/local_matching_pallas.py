"""Pallas TPU kernel for windowed local matching (SURVEY.md C4).

The jnp implementation (ops/matching.py::local_matching) walks the dy
shift lattice — VPU-bound. This kernel restructures the computation as a
row-band matmul so the cross terms ride the MXU:

  grid over blocks of query rows. For each block:
    1. DMA the previous frame's (rows + 2w) row strip from HBM to VMEM
       (strips overlap between blocks — not expressible as a BlockSpec
       tiling, hence the manual async copy).
    2. cross2 = q_blk @ (-2 k_strip)^T on the MXU: every query in the
       block against every key in the strip.
    3. add the window band mask (|dy| <= w by strip-row index, |dx| <= w
       by column index, from broadcasted iota — no mask tensor in HBM)
       and, per object, the precomputed gated |k|^2 row (+BIG off-object),
       then min-reduce over the strip.

As with the global kernel, min_k(|q|^2 + |k|^2 - 2qk) = |q|^2 + min_k(...)
lets |q|^2 move outside; the wrapper adds it and normalizes in XLA.

Zero-padding rows (±w) around the previous frame carry |k|^2 = BIG so they
never win; the object gate also covers them.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from cvpr2020_manet_tpu.ops.matching import (
    WRONG_LABEL_PADDING_DISTANCE, normalize_distance)


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def _kernel(q_ref, k2_hbm, kno_hbm, out_ref, k2_s, kno_s, sem,
            *, rows, width, window, n_obj_pad):
    i = pl.program_id(0)
    strip_rows = rows + 2 * window
    strip = strip_rows * width
    nq = rows * width

    # DMA this block's key strip (strips overlap across blocks)
    cp1 = pltpu.make_async_copy(
        k2_hbm.at[pl.ds(i * rows * width, strip), :], k2_s, sem)
    cp1.start()
    cp1.wait()
    cp2 = pltpu.make_async_copy(
        kno_hbm.at[:, pl.ds(i * rows * width, strip)], kno_s, sem)
    cp2.start()
    cp2.wait()

    cross2 = jax.lax.dot_general(
        q_ref[:], k2_s[:], dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32)          # (nq, strip) on MXU

    # window band mask: query (ry, rx), strip key (ky, kx);
    # original-row distance = |ry + w - ky|, column distance = |rx - kx|
    ry = jax.lax.broadcasted_iota(jnp.int32, (nq, strip), 0) // width
    rx = jax.lax.broadcasted_iota(jnp.int32, (nq, strip), 0) % width
    ky = jax.lax.broadcasted_iota(jnp.int32, (nq, strip), 1) // width
    kx = jax.lax.broadcasted_iota(jnp.int32, (nq, strip), 1) % width
    in_band = (jnp.abs(ry + window - ky) <= window) \
        & (jnp.abs(rx - kx) <= window)
    banded = jnp.where(in_band, cross2, WRONG_LABEL_PADDING_DISTANCE)

    for o in range(n_obj_pad):
        e = banded + kno_s[o, :][None, :]
        out_ref[o, :] = jnp.min(e, axis=1)


def _kernel_argmin(q_ref, k2_hbm, kno_hbm, out_ref, idx_ref,
                   k2_s, kno_s, sem, *, rows, width, window, n_obj_pad):
    """As _kernel, additionally emitting the winning key's flat index in the
    PADDED previous-frame layout (for the custom VJP's argmin routing)."""
    i = pl.program_id(0)
    strip_rows = rows + 2 * window
    strip = strip_rows * width

    cp1 = pltpu.make_async_copy(
        k2_hbm.at[pl.ds(i * rows * width, strip), :], k2_s, sem)
    cp1.start()
    cp1.wait()
    cp2 = pltpu.make_async_copy(
        kno_hbm.at[:, pl.ds(i * rows * width, strip)], kno_s, sem)
    cp2.start()
    cp2.wait()

    nq = rows * width
    cross2 = jax.lax.dot_general(
        q_ref[:], k2_s[:], dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32)
    ry = jax.lax.broadcasted_iota(jnp.int32, (nq, strip), 0) // width
    rx = jax.lax.broadcasted_iota(jnp.int32, (nq, strip), 0) % width
    ky = jax.lax.broadcasted_iota(jnp.int32, (nq, strip), 1) // width
    kx = jax.lax.broadcasted_iota(jnp.int32, (nq, strip), 1) % width
    in_band = (jnp.abs(ry + window - ky) <= window) \
        & (jnp.abs(rx - kx) <= window)
    banded = jnp.where(in_band, cross2, WRONG_LABEL_PADDING_DISTANCE)

    base = i * rows * width
    for o in range(n_obj_pad):
        e = banded + kno_s[o, :][None, :]
        out_ref[o, :] = jnp.min(e, axis=1)
        idx_ref[o, :] = jnp.argmin(e, axis=1).astype(jnp.int32) + base


@functools.partial(jax.jit, static_argnames=("window", "rows_per_block",
                                             "interpret"))
def local_matching_pallas_argmin(
    query: jax.Array,        # (H, W, C)
    prev: jax.Array,         # (H, W, C)
    prev_onehot: jax.Array,  # (H, W, O)
    *,
    window: int = 15,
    rows_per_block: int = 2,
    interpret: bool = False,
):
    """Local matching + winner indices.

    Returns (normalized distances (H, W, O), argmin (H, W, O) int32 = flat
    index into the ORIGINAL (H*W) previous frame, -1 where the winner was a
    padding pixel).
    """
    h, w, c = query.shape
    o = prev_onehot.shape[-1]
    o_pad = _round_up(o, 8)
    c_pad = _round_up(c, 128)
    rows = rows_per_block
    h_pad = _round_up(h, rows)
    import math
    w_pad = _round_up(w, 128 // math.gcd(rows, 128))

    q = jnp.pad(query.astype(jnp.float32),
                ((0, h_pad - h), (0, w_pad - w), (0, c_pad - c)))
    kpad = ((window, window + (h_pad - h)), (0, w_pad - w), (0, c_pad - c))
    k2 = jnp.pad(-2.0 * prev.astype(jnp.float32), kpad)
    kn = jnp.sum(jnp.square(prev.astype(jnp.float32)), axis=-1)
    gate = prev_onehot.astype(jnp.float32)
    kno = kn[None] + (1.0 - jnp.moveaxis(gate, -1, 0)) \
        * WRONG_LABEL_PADDING_DISTANCE
    kno = jnp.pad(kno, ((0, o_pad - o), kpad[0], (0, w_pad - w)),
                  constant_values=WRONG_LABEL_PADDING_DISTANCE)

    strip_rows = rows + 2 * window
    nq_blk = rows * w_pad
    grid = (h_pad // rows,)
    out, idx = pl.pallas_call(
        functools.partial(_kernel_argmin, rows=rows, width=w_pad,
                          window=window, n_obj_pad=o_pad),
        out_shape=(jax.ShapeDtypeStruct((o_pad, h_pad * w_pad), jnp.float32),
                   jax.ShapeDtypeStruct((o_pad, h_pad * w_pad), jnp.int32)),
        grid=grid,
        in_specs=[
            pl.BlockSpec((nq_blk, c_pad), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=(
            pl.BlockSpec((o_pad, nq_blk), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((o_pad, nq_blk), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
        ),
        scratch_shapes=[
            pltpu.VMEM((strip_rows * w_pad, c_pad), jnp.float32),
            pltpu.VMEM((o_pad, strip_rows * w_pad), jnp.float32),
            pltpu.SemaphoreType.DMA,
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",)),
        interpret=interpret,
    )(q.reshape(h_pad * w_pad, c_pad),
      k2.reshape(-1, c_pad),
      kno.reshape(o_pad, -1))

    dmin = out.reshape(o_pad, h_pad, w_pad)[:o, :h, :w]
    dmin = jnp.moveaxis(dmin, 0, -1)                       # (H, W, O)
    qn = jnp.sum(jnp.square(query.astype(jnp.float32)), axis=-1)
    d = jnp.minimum(jnp.maximum(dmin + qn[..., None], 0.0),
                    WRONG_LABEL_PADDING_DISTANCE)

    # map padded-strip winner index -> original (H*W) flat index
    flat = jnp.moveaxis(idx.reshape(o_pad, h_pad, w_pad)[:o, :h, :w], 0, -1)
    prow = flat // w_pad - window                          # un-pad rows
    pcol = flat % w_pad
    valid = (prow >= 0) & (prow < h) & (pcol < w)
    amin = jnp.where(valid, prow * w + pcol, -1)
    return normalize_distance(d), amin


@functools.partial(jax.custom_vjp, nondiff_argnums=(3,))
def local_matching_trainable(query, prev, prev_onehot, window=15):
    """Differentiable Pallas local matching (argmin-routed gradients, same
    subgradient the jnp oracle's hard min produces — SURVEY.md §8 hard
    parts). prev_onehot gets no gradient (it is a hard argmax upstream)."""
    out, _ = local_matching_pallas_argmin(query, prev, prev_onehot,
                                          window=window)
    return out


def _lm_train_fwd(query, prev, prev_onehot, window):
    out, amin = local_matching_pallas_argmin(query, prev, prev_onehot,
                                             window=window)
    return out, (query, prev, prev_onehot, amin)


def _lm_train_bwd(window, res, g):
    query, prev, prev_onehot, amin = res
    h, w, c = query.shape
    o = amin.shape[-1]
    n = h * w
    q32 = query.astype(jnp.float32).reshape(n, c)
    k32 = prev.astype(jnp.float32).reshape(n, c)
    oh = prev_onehot.astype(jnp.float32).reshape(n, o)
    af = amin.reshape(n, o)                                 # (N, O)
    a_c = jnp.clip(af, 0, n - 1)
    k_a = jnp.take(k32, a_c, axis=0)                        # (N, O, C)
    # the winner must be a real, on-object pixel; otherwise the forward
    # value saturates at 1.0 (sentinel >= 30 clamp) and the true grad is 0
    on_obj = oh[a_c, jnp.arange(o)[None, :]]                # (N, O)
    diff = q32[:, None, :] - k_a
    d = jnp.sum(jnp.square(diff), axis=-1)                  # (N, O)
    sig = jax.nn.sigmoid(d)
    deriv = 2.0 * sig * (1.0 - sig)
    gate = (af >= 0) & (on_obj > 0) & (d < 30.0)
    gd = g.reshape(n, o) * deriv * gate
    gq = jnp.sum(2.0 * diff * gd[..., None], axis=1)        # (N, C)
    scatter_idx = jnp.where(af >= 0, af, n)
    gk = jnp.zeros((n, c), jnp.float32).at[scatter_idx.reshape(-1)].add(
        (-2.0 * diff * gd[..., None]).reshape(-1, c), mode="drop")
    return (gq.reshape(h, w, c).astype(query.dtype),
            gk.reshape(h, w, c).astype(prev.dtype),
            jnp.zeros_like(prev_onehot))


local_matching_trainable.defvjp(_lm_train_fwd, _lm_train_bwd)


@functools.partial(jax.jit, static_argnames=("window", "rows_per_block",
                                             "normalize", "interpret"))
def local_matching_pallas(
    query: jax.Array,        # (H, W, C)
    prev: jax.Array,         # (H, W, C)
    prev_onehot: jax.Array,  # (H, W, O)
    *,
    window: int = 15,
    rows_per_block: int = 2,   # VMEM budget: cross2 tile is
                               # (rows*w_pad) x ((rows+2w)*w_pad) f32
    normalize: bool = True,
    interpret: bool = False,
) -> jax.Array:
    """Drop-in replacement for ops.matching.local_matching. -> (H, W, O)."""
    h, w, c = query.shape
    o = prev_onehot.shape[-1]
    o_pad = _round_up(o, 8)
    c_pad = _round_up(c, 128)
    rows = rows_per_block
    h_pad = _round_up(h, rows)
    # width padded so a block of rows (rows * w_pad) is a lane multiple;
    # padded columns carry BIG |k|^2 and their query outputs are sliced off
    import math
    w_pad = _round_up(w, 128 // math.gcd(rows, 128))

    q = jnp.pad(query.astype(jnp.float32),
                ((0, h_pad - h), (0, w_pad - w), (0, c_pad - c)))
    # previous frame padded by `window` rows top/bottom (plus block padding
    # at the bottom) so every strip read is in-bounds and uniform
    kpad = ((window, window + (h_pad - h)), (0, w_pad - w), (0, c_pad - c))
    k2 = jnp.pad(-2.0 * prev.astype(jnp.float32), kpad)
    kn = jnp.sum(jnp.square(prev.astype(jnp.float32)), axis=-1)  # (H, W)
    gate = prev_onehot.astype(jnp.float32)
    # gated |k|^2 per object; BIG on off-object and padding rows/cols
    kno = kn[None] + (1.0 - jnp.moveaxis(gate, -1, 0)) \
        * WRONG_LABEL_PADDING_DISTANCE                # (O, H, W)
    kno = jnp.pad(kno, ((0, o_pad - o), kpad[0], (0, w_pad - w)),
                  constant_values=WRONG_LABEL_PADDING_DISTANCE)
    w = w_pad

    strip_rows = rows + 2 * window
    nq_blk = rows * w
    grid = (h_pad // rows,)
    out = pl.pallas_call(
        functools.partial(_kernel, rows=rows, width=w, window=window,
                          n_obj_pad=o_pad),
        out_shape=jax.ShapeDtypeStruct((o_pad, h_pad * w), jnp.float32),
        grid=grid,
        in_specs=[
            pl.BlockSpec((nq_blk, c_pad), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pl.ANY),     # k2 (strips DMA'd)
            pl.BlockSpec(memory_space=pl.ANY),     # kno
        ],
        out_specs=pl.BlockSpec((o_pad, nq_blk), lambda i: (0, i),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((strip_rows * w, c_pad), jnp.float32),
            pltpu.VMEM((o_pad, strip_rows * w), jnp.float32),
            pltpu.SemaphoreType.DMA,
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * h_pad * w * strip_rows * w * c_pad,
            bytes_accessed=(h_pad * w * c_pad * 2
                            + grid[0] * strip_rows * w * (c_pad + o_pad)) * 4,
            transcendentals=0,
        ),
        interpret=interpret,
    )(q.reshape(h_pad * w, c_pad),
      k2.reshape(-1, c_pad),
      kno.reshape(o_pad, -1))

    w_orig = query.shape[1]
    dmin = out.reshape(o_pad, h_pad, w)[:o, :h, :w_orig]   # (O, H, W)
    dmin = jnp.moveaxis(dmin, 0, -1)                       # (H, W, O)
    qn = jnp.sum(jnp.square(query.astype(jnp.float32)), axis=-1)
    d = jnp.minimum(jnp.maximum(dmin + qn[..., None], 0.0),
                    WRONG_LABEL_PADDING_DISTANCE)
    return normalize_distance(d) if normalize else d
