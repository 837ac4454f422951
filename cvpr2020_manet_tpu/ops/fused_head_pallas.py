"""Fused Pallas kernel for the propagation decoder head (SURVEY.md C6).

The object-folded head is HBM-BANDWIDTH-bound on TPU (docs/BENCHMARKS.md):
XLA's conv stack reads/writes the (O, h, w, C) activations six times. This
kernel streams row strips of the input ONCE through the whole stack —
3x [conv3x3 -> LayerNorm -> relu] -> 1x1 logit — keeping every
intermediate in VMEM.

Design notes (each shaped by a Mosaic lowering constraint):
- grid (O, h / ROWS); each step DMAs an input strip of ROWS + 6 halo rows
  (1 halo row per side per conv stage) from HBM — strips overlap between
  row blocks, hence manual DMA instead of a BlockSpec tiling.
- activations live in VMEM scratch as (rows, width*C) with width folded
  into the LANE dimension: a conv dx-shift is then a lane offset dx*C
  (C = 128-multiple), which is statically tile-aligned — Mosaic rejects
  dynamic sublane-dim slice starts that are not 8-multiples.
- each conv3x3 = 9 shifted (rows*W, Cin) @ (Cin, Cout) MXU matmuls,
  accumulated in a fori_loop (unrolled taps kept 9 patch buffers live:
  33 MB > the 16 MB VMEM budget). Weights are (9, Cin, Cout), tap-indexed
  on the untiled leading dim.
- LayerNorm over channels (per pixel) is tile-local, unlike the spatial
  GroupNorm it replaces in the fused configuration (ConvNeXt-style;
  ModelConfig.head_norm = 'ln').
- stacked-SAME parity: out-of-image rows/cols are re-zeroed between
  stages (edge_zero) so borders match flax exactly (golden-tested).
"""

from __future__ import annotations

import functools
from typing import Sequence

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

ROWS = 8        # output rows per grid step
HALO = 3        # one halo row per side per conv stage


def _ln(x, scale, bias, eps=1e-6):
    m = jnp.mean(x, axis=-1, keepdims=True)
    v = jnp.mean(jnp.square(x - m), axis=-1, keepdims=True)
    return (x - m) * jax.lax.rsqrt(v + eps) * scale + bias


def _conv3x3_ref(src_ref, w_ref, r_out, wd_out, cin):
    """3x3 'VALID' conv; src_ref (rows, width*cin) 2D VMEM scratch, w_ref
    (9, cin, cout). -> (r_out * wd_out, cout) f32.

    dy is unrolled STATICALLY (Mosaic forbids unaligned dynamic sublane
    starts; static unaligned is fine); the dx taps run in a fori_loop
    whose shifts are lane offsets of dx*cin (tile-aligned by
    construction), which also bounds live patch buffers (fully unrolled
    taps blew the 16 MB VMEM budget).
    """
    cout = w_ref.shape[-1]
    acc = jnp.zeros((r_out * wd_out, cout), jnp.float32)
    for dy in range(3):                           # static row shifts
        def body(dx, acc, dy=dy):
            start = pl.multiple_of(dx * cin, cin)
            patch = src_ref[dy:dy + r_out, pl.ds(start, wd_out * cin)]
            # bf16 operands (f32 MXU accumulation): halves the live patch
            # buffers that dominate the VMEM budget
            patch = patch.reshape(r_out * wd_out, cin).astype(jnp.bfloat16)
            tap = w_ref[pl.ds(3 * dy + dx, 1), :, :].reshape(
                cin, cout).astype(jnp.bfloat16)
            return acc + jax.lax.dot_general(
                patch, tap, dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
        acc = jax.lax.fori_loop(0, 3, body, acc)
    return acc


def _head_kernel(x_hbm, w1_ref, w2_ref, w3_ref, wl_ref, ln_ref, out_ref,
                 x_s, y1_s, y2_s, sem, *, rows, width, h_img, wb, cin_pad):
    o_idx = pl.program_id(0)
    i = pl.program_id(1)
    j = pl.program_id(2)          # column block
    strip = rows + 2 * HALO
    c = w1_ref.shape[-1]
    wp = wb + 2 * HALO            # block width incl col halos

    col0 = j * wb                 # absolute col of this block's first output
    cp = pltpu.make_async_copy(
        x_hbm.at[o_idx, pl.ds(pl.multiple_of(i * rows, rows), strip + 2),
                 pl.ds(pl.multiple_of(col0 * cin_pad, 128), wp * cin_pad)],
        x_s, sem)
    cp.start()
    cp.wait()

    def edge_zero(y, r, wd, halo_left):
        """Stacked-SAME parity: zero rows/cols outside the true image
        before the next conv consumes them."""
        abs_row = (i * rows - halo_left
                   + jax.lax.broadcasted_iota(jnp.int32, (r, wd, 1), 0))
        col = (col0 - halo_left
               + jax.lax.broadcasted_iota(jnp.int32, (r, wd, 1), 1))
        ok = ((abs_row >= 0) & (abs_row < h_img)
              & (col >= 0) & (col < width))
        return jnp.where(ok, y, 0.0)

    ln = ln_ref[:]                              # (6, C)

    r1, w1d = strip - 2, wp - 2
    y = _conv3x3_ref(x_s, w1_ref, r1, w1d, cin_pad).reshape(r1, w1d, c)
    y = jnp.maximum(_ln(y, ln[0][None, None], ln[1][None, None]), 0.0)
    y1_s[:r1, :] = edge_zero(y, r1, w1d, 2).reshape(r1, w1d * c)

    r2, w2d = strip - 4, wp - 4
    y = _conv3x3_ref(y1_s, w2_ref, r2, w2d, c).reshape(r2, w2d, c)
    y = jnp.maximum(_ln(y, ln[2][None, None], ln[3][None, None]), 0.0)
    y2_s[:r2, :] = edge_zero(y, r2, w2d, 1).reshape(r2, w2d * c)

    r3, w3d = rows, wp - 6
    y = _conv3x3_ref(y2_s, w3_ref, r3, w3d, c).reshape(r3, w3d, c)
    y = jnp.maximum(_ln(y, ln[4][None, None], ln[5][None, None]), 0.0)
    logit = jax.lax.dot_general(
        y.reshape(-1, c), wl_ref[:],
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)     # (rows*w3d, 1)
    out_ref[0, :, :] = logit.reshape(rows, w3d)


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


@functools.partial(jax.jit, static_argnames=("interpret",))
def fused_seg_head(
    x: jax.Array,            # (O, h, w, Cin) head input
    w1: jax.Array,           # (3, 3, Cin, C)
    w2: jax.Array,           # (3, 3, C, C)
    w3: jax.Array,           # (3, 3, C, C)
    wl: jax.Array,           # (C, 1) logit weights
    wl_bias: jax.Array,      # (1,)
    ln_params: Sequence[jax.Array],  # 6x (C,): scale/bias per LN
    *,
    interpret: bool = False,
) -> jax.Array:
    """-> logits (O, h, w) float32. Equivalent to 3x[conv3x3-LN-relu] +
    1x1 conv with 'SAME' zero padding (flax DynamicSegHead, norm='ln')."""
    o, h, w, cin = x.shape
    c = w1.shape[-1]
    if not interpret:
        # dx shifts are lane offsets of dx*C: compiled Mosaic needs them
        # tile-aligned
        assert c % 128 == 0, "head channels must be a lane multiple"
    cin_pad = _round_up(cin, 128)
    h_pad = _round_up(h, ROWS)
    # column blocks: bound the per-step VMEM footprint (the whole-width
    # strip at 384 padded input channels blew the 16 MB budget); block
    # halos read REAL neighbor columns from the padded full-width image
    n_cb = max(1, -(-w // 128))
    wb = -(-w // n_cb)
    if not interpret:
        wb = _round_up(wb, 128)    # output blocks must be lane multiples
    w_pad = n_cb * wb
    # f32 + 2 extra tail rows: DMA strips are 16 rows long starting at
    # 8-multiples (Mosaic alignment rules for tiled HBM slices)
    xp = jnp.pad(x.astype(jnp.float32),
                 ((0, 0), (HALO, HALO + (h_pad - h) + 2),
                  (HALO, HALO + (w_pad - w)),
                  (0, cin_pad - cin)))
    xp = xp.reshape(o, h_pad + 2 * HALO + 2, (w_pad + 2 * HALO) * cin_pad)
    w1p = jnp.pad(w1.astype(jnp.float32),
                  ((0, 0), (0, 0), (0, cin_pad - cin), (0, 0)))
    ln6 = jnp.stack([p.astype(jnp.float32) for p in ln_params])  # (6, C)

    grid = (o, h_pad // ROWS, n_cb)
    strip = ROWS + 2 * HALO
    wp_b = wb + 2 * HALO
    out = pl.pallas_call(
        functools.partial(_head_kernel, rows=ROWS, width=w, h_img=h,
                          wb=wb, cin_pad=cin_pad),
        out_shape=jax.ShapeDtypeStruct((o, h_pad, w_pad), jnp.float32),
        grid=grid,
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.ANY),      # x (strips DMA'd)
            pl.BlockSpec(memory_space=pltpu.VMEM),     # w1 (9, cin, c)
            pl.BlockSpec(memory_space=pltpu.VMEM),     # w2
            pl.BlockSpec(memory_space=pltpu.VMEM),     # w3
            pl.BlockSpec(memory_space=pltpu.VMEM),     # wl
            pl.BlockSpec(memory_space=pltpu.VMEM),     # ln params
        ],
        out_specs=pl.BlockSpec((1, ROWS, wb), lambda oi, i, j: (oi, i, j),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((strip + 2, wp_b * cin_pad), jnp.float32),
            pltpu.VMEM((strip - 2, (wp_b - 2) * c), jnp.float32),
            pltpu.VMEM((strip - 4, (wp_b - 4) * c), jnp.float32),
            pltpu.SemaphoreType.DMA,
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary", "arbitrary"),
        ),
        interpret=interpret,
    )(xp,
      w1p.reshape(9, cin_pad, c),
      w2.astype(jnp.float32).reshape(9, c, c),
      w3.astype(jnp.float32).reshape(9, c, c),
      wl.astype(jnp.float32), ln6)
    return out[:, :h, :w] + wl_bias.astype(jnp.float32)[0]
