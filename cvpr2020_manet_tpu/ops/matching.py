"""Pixel-wise semantic matching — pure-jnp reference implementation.

This is the correctness oracle for the Pallas kernel in
`ops/matching_pallas.py`, and the jittable fallback on CPU.

Upstream behavior being matched (SURVEY.md C3/C4, expected at
ref:networks/IntVOS.py — `global_matching`, `global_matching_for_eval`,
`local_pairwise_distances`, `local_matching`,
`WRONG_LABEL_PADDING_DISTANCE`):

- **Global matching** (FEELVOS-style): for every query pixel p of the
  current frame and every object o, the minimum squared L2 distance between
  the query embedding e(p) and the embeddings of reference pixels labelled
  o. Reference pixels of the *wrong* label are padded with a huge constant
  so they never win the min. The reference chunks over reference pixels in
  a Python loop to bound memory; here the chunking is a `lax.scan` with a
  running min, which is also exactly the streaming structure of the Pallas
  kernel (flash-attention skeleton with running-min instead of
  online-softmax).

- **Local matching**: same min-distance idea against the *previous* frame
  only, restricted to a (2d+1)^2 spatial window around each pixel
  (translation-bounded motion prior), with previous-frame pixels gated by
  the previous predicted mask.

- Distances are normalized to [0, 1) via `d -> 1 - 2 / (1 + exp(d))`
  (FEELVOS's normalization; monotone, so min-fusion commutes with it).

Shapes use a trailing object axis `O` = max_objects+1 with background as
object 0 (SURVEY.md §3.2: softmax over {background ∪ objects}).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

# Sentinel added to distances of wrong-label reference pixels
# (ref:networks/IntVOS.py WRONG_LABEL_PADDING_DISTANCE, expected).
# Kept at 1e8 (not 1e20) so it survives float32 addition without inf.
WRONG_LABEL_PADDING_DISTANCE = 1e8


def normalize_distance(d: jax.Array) -> jax.Array:
    """Map squared distances [0, inf) -> [0, 1), FEELVOS-style.

    0 distance -> 0; wrong-label sentinel saturates to exactly 1.0.
    Monotone increasing, so elementwise-min memory fusion (SURVEY.md C8)
    can be done on normalized values.
    """
    return 1.0 - 2.0 / (1.0 + jnp.exp(jnp.minimum(d, 30.0)))


def pairwise_sq_distances(q: jax.Array, k: jax.Array) -> jax.Array:
    """Squared L2 distances between rows of q (Nq, C) and k (Nk, C).

    Uses the ||q||^2 + ||k||^2 - 2 q.k expansion so the inner product rides
    the MXU; accumulation is forced to float32.
    """
    qn = jnp.sum(jnp.square(q.astype(jnp.float32)), axis=-1, keepdims=True)
    kn = jnp.sum(jnp.square(k.astype(jnp.float32)), axis=-1, keepdims=True)
    cross = jax.lax.dot_general(
        q, k,
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST,
    )
    return jnp.maximum(qn + kn.T - 2.0 * cross, 0.0)


@functools.partial(jax.jit, static_argnames=("chunk", "normalize"))
def global_matching(
    query: jax.Array,        # (Nq, C) current-frame embeddings
    ref: jax.Array,          # (Nk, C) reference (memory) embeddings
    ref_onehot: jax.Array,   # (Nk, O) {0,1} per-object labels of ref pixels
    ref_valid: jax.Array | None = None,  # (Nk,) {0,1} padding mask
    *,
    chunk: int = 1024,
    normalize: bool = True,
) -> jax.Array:
    """Per-object nearest-neighbor distance maps. Returns (Nq, O).

    Objects with zero reference pixels saturate at the max distance (1.0
    when normalized) — callers mask by object validity.
    """
    nq, c = query.shape
    nk, o = ref_onehot.shape
    pad = (-nk) % chunk
    if pad:
        ref = jnp.pad(ref, ((0, pad), (0, 0)))
        ref_onehot = jnp.pad(ref_onehot, ((0, pad), (0, 0)))
        if ref_valid is None:
            ref_valid = jnp.concatenate(
                [jnp.ones((nk,), jnp.float32), jnp.zeros((pad,), jnp.float32)])
        else:
            ref_valid = jnp.pad(ref_valid.astype(jnp.float32), (0, pad))
    elif ref_valid is None:
        ref_valid = jnp.ones((nk,), jnp.float32)
    else:
        ref_valid = ref_valid.astype(jnp.float32)

    n_chunks = ref.shape[0] // chunk
    ref_c = ref.reshape(n_chunks, chunk, c)
    oh_c = ref_onehot.reshape(n_chunks, chunk, o).astype(jnp.float32)
    valid_c = ref_valid.reshape(n_chunks, chunk)

    def body(running_min, xs):
        ref_blk, oh_blk, valid_blk = xs
        d = pairwise_sq_distances(query, ref_blk)            # (Nq, chunk)
        # wrong-label or padded pixels can never win the min
        gate = oh_blk * valid_blk[:, None]                   # (chunk, O)
        d_obj = d[:, :, None] + (1.0 - gate)[None] * WRONG_LABEL_PADDING_DISTANCE
        return jnp.minimum(running_min, jnp.min(d_obj, axis=1)), None

    init = jnp.full((nq, o), WRONG_LABEL_PADDING_DISTANCE, jnp.float32)
    dmin, _ = jax.lax.scan(body, init, (ref_c, oh_c, valid_c))
    dmin = jnp.minimum(dmin, WRONG_LABEL_PADDING_DISTANCE)
    return normalize_distance(dmin) if normalize else dmin


@functools.partial(jax.jit, static_argnames=("window", "normalize"))
def local_matching(
    query: jax.Array,        # (H, W, C) current-frame embeddings
    prev: jax.Array,         # (H, W, C) previous-frame embeddings
    prev_onehot: jax.Array,  # (H, W, O) previous-frame predicted mask, one-hot
    *,
    window: int = 15,
    normalize: bool = True,
) -> jax.Array:
    """Windowed min-distance vs the previous frame. Returns (H, W, O).

    d_local(p, o) = min over offsets |dy|,|dx| <= window of
      ||e_t(p) - e_{t-1}(p + (dy,dx))||^2, over prev pixels predicted o.

    Structured for TPU: a `lax.scan` over the (2w+1) dy shifts only; for
    each dy strip, the (2w+1) dx shifts are STATIC slices unrolled inside
    the step, so the loop is 31 fused steps instead of 961 tiny dispatches
    (measured ~30x wall-clock on v5e). |k|^2 norms precomputed once; the
    cross term uses the -2qk expansion. Memory stays O(HWO).
    """
    h, w, c = query.shape
    o = prev_onehot.shape[-1]
    win = 2 * window + 1
    prev_pad = jnp.pad(prev, ((window, window), (window, window), (0, 0)))
    oh_pad = jnp.pad(prev_onehot.astype(jnp.float32),
                     ((window, window), (window, window), (0, 0)))
    q32 = query.astype(jnp.float32)
    qn = jnp.sum(jnp.square(q32), axis=-1)                   # (H, W)
    kn_pad = jnp.sum(jnp.square(prev_pad.astype(jnp.float32)), axis=-1)
    # gate padding rows/cols out via the onehot (already 0 there)

    def body(running_min, dy):
        k_strip = jax.lax.dynamic_slice(
            prev_pad, (dy, 0, 0), (h, w + 2 * window, c)).astype(jnp.float32)
        kn_strip = jax.lax.dynamic_slice(
            kn_pad, (dy, 0), (h, w + 2 * window))
        m_strip = jax.lax.dynamic_slice(
            oh_pad, (dy, 0, 0), (h, w + 2 * window, o))
        for dx in range(win):                                # static unroll
            k = jax.lax.slice_in_dim(k_strip, dx, dx + w, axis=1)
            kn = jax.lax.slice_in_dim(kn_strip, dx, dx + w, axis=1)
            m = jax.lax.slice_in_dim(m_strip, dx, dx + w, axis=1)
            cross = jnp.sum(q32 * k, axis=-1)                # (H, W)
            d = jnp.maximum(qn + kn - 2.0 * cross, 0.0)
            d_obj = d[:, :, None] + (1.0 - m) * WRONG_LABEL_PADDING_DISTANCE
            running_min = jnp.minimum(running_min, d_obj)
        return running_min, None

    init = jnp.full((h, w, o), WRONG_LABEL_PADDING_DISTANCE, jnp.float32)
    dmin, _ = jax.lax.scan(body, init, jnp.arange(win))
    dmin = jnp.minimum(dmin, WRONG_LABEL_PADDING_DISTANCE)
    return normalize_distance(dmin) if normalize else dmin
