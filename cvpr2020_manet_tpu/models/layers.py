"""Shared layer utilities: norm factory, resize semantics.

Norms (SURVEY.md C10, §8): the reference vendors a thread/pipe SyncBN
(ref:networks/deeplab/sync_batchnorm/). TPU-native the same capability is
one argument: `flax.linen.BatchNorm(axis_name='data')` computes batch
moments with a cross-replica `lax.pmean` inside the sharded step — that IS
synchronized batch norm, without a communication backend. We additionally
support GroupNorm (default) which removes batch-statistics plumbing
entirely and is the standard TPU choice for small per-device batches.

Resize: all mask/feature resizing in this codebase goes through
`upsample`/`downsample` below (jax.image.resize, bilinear, half-pixel
centers == align_corners=False). Documented once here per SURVEY.md §8
"hard parts" so mask fidelity semantics are pinned.
"""

from __future__ import annotations

from typing import Any, Callable

import jax
import jax.numpy as jnp
from flax import linen as nn


class FrozenAffine(nn.Module):
    """Frozen BatchNorm as a per-channel affine: y = x * scale + bias.

    The standard inference form of pretrained BN — running statistics are
    folded into (scale, bias) at weight-conversion time
    (utils/pretrained.py). The reference freezes BN when fine-tuning the
    pretrained DeepLab backbone; this is the TPU-native equivalent with no
    batch-statistics plumbing at all.
    """

    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        c = x.shape[-1]
        scale = self.param("scale", nn.initializers.ones, (c,))
        bias = self.param("bias", nn.initializers.zeros, (c,))
        return (x * scale.astype(self.dtype) + bias.astype(self.dtype)
                ).astype(x.dtype)


def make_norm(norm: str, dtype: Any, gn_groups: int = 32,
              axis_name: str | None = None) -> Callable[..., nn.Module]:
    """Return a norm-module constructor.

    norm in {'gn', 'bn', 'syncbn', 'frozen'}; 'syncbn' = BatchNorm with
    cross-replica moments via axis_name (the one-argument replacement for
    the reference's vendored SyncBN); 'frozen' = FrozenAffine above.
    """
    if norm == "gn":
        def ctor(name=None):
            return nn.GroupNorm(num_groups=gn_groups, dtype=dtype, name=name)
    elif norm in ("bn", "syncbn"):
        def ctor(name=None):
            return nn.BatchNorm(
                use_running_average=False,
                momentum=0.99,
                axis_name=axis_name if norm == "syncbn" else None,
                dtype=dtype,
                name=name,
            )
    elif norm == "ln":
        # per-pixel channel LayerNorm (ConvNeXt-style)
        def ctor(name=None):
            return nn.LayerNorm(dtype=dtype, name=name)
    elif norm == "frozen":
        def ctor(name=None):
            return FrozenAffine(dtype=dtype, name=name)
    else:
        raise ValueError(f"unknown norm {norm!r}")
    return ctor


def _upsample_axis_int(x: jax.Array, axis: int, s: int) -> jax.Array:
    """Bilinear upsample by integer factor s along `axis`, half-pixel
    centers with edge clamping — numerically identical to
    jax.image.resize(..., 'bilinear') for integer factors, but lowered as
    slices + lerps (fast on TPU; resize's gather path is pathologically
    slow through XLA here — measured ~60 ms per 16-frame mask upsample)."""
    x = jnp.moveaxis(x, axis, 0)
    prev = jnp.concatenate([x[:1], x[:-1]], axis=0)   # x[i-1], edge-clamped
    nxt = jnp.concatenate([x[1:], x[-1:]], axis=0)    # x[i+1], edge-clamped
    phases = []
    for r in range(s):
        t = (r + 0.5) / s - 0.5
        if t < 0:
            phases.append((-t) * prev + (1.0 + t) * x)
        else:
            phases.append((1.0 - t) * x + t * nxt)
    y = jnp.stack(phases, axis=1)                     # (n, s, ...)
    y = y.reshape((x.shape[0] * s,) + x.shape[1:])
    return jnp.moveaxis(y, 0, axis)


def _downsample_axis_2x(x: jax.Array, axis: int) -> jax.Array:
    """Bilinear downsample by 2 with jax.image.resize's anti-aliasing:
    a 4-tap triangle kernel (1/8, 3/8, 3/8, 1/8), edge-clamped."""
    x = jnp.moveaxis(x, axis, 0)
    prev = jnp.concatenate([x[:1], x[:-1]], axis=0)   # x[i-1]
    nxt = jnp.concatenate([x[1:], x[-1:]], axis=0)    # x[i+1]
    y = (0.125 * prev[0::2] + 0.375 * x[0::2]
         + 0.375 * x[1::2] + 0.125 * nxt[1::2])
    # edge outputs: out-of-range taps are DROPPED and the kernel
    # renormalized (jax.image.resize semantics), not clamped
    y = y.at[0].set((0.375 * x[0] + 0.375 * x[1] + 0.125 * x[2]) / 0.875)
    y = y.at[-1].set((0.125 * x[-3] + 0.375 * x[-2] + 0.375 * x[-1]) / 0.875)
    return jnp.moveaxis(y, 0, axis)


def resize_bilinear(x: jax.Array, shape: tuple[int, int]) -> jax.Array:
    """Bilinear resize of NHWC (or HWC) to spatial `shape`.

    Half-pixel-center semantics (torch align_corners=False equivalent).
    Integer up-factors and /2 down-factors take a fast slice+lerp path
    (exactly equal to jax.image.resize, pinned by tests); everything else
    falls back to jax.image.resize.
    """
    h_ax = x.ndim - 3
    w_ax = x.ndim - 2
    h, w = x.shape[h_ax], x.shape[w_ax]
    th, tw = shape
    orig_dtype = x.dtype

    def fast_axis(y, axis, src, dst):
        if dst == src:
            return y
        if dst > src and dst % src == 0:
            return _upsample_axis_int(y, axis, dst // src)
        if src == 2 * dst and src >= 4:
            return _downsample_axis_2x(y, axis)
        return None

    y = x.astype(jnp.float32)
    yh = fast_axis(y, h_ax, h, th)
    if yh is not None:
        yw = fast_axis(yh, w_ax, w, tw)
        if yw is not None:
            return yw.astype(orig_dtype)

    if x.ndim == 4:
        out_shape = (x.shape[0], *shape, x.shape[3])
    else:
        out_shape = (*shape, x.shape[-1])
    return jax.image.resize(x, out_shape, method="bilinear").astype(orig_dtype)


def resize_nearest(x: jax.Array, shape: tuple[int, int]) -> jax.Array:
    """Nearest resize — for label/mask maps (no label bleeding).

    Integer factors take a strided-slice / repeat fast path (identical to
    jax.image.resize 'nearest'); anything else falls back.
    """
    h_ax, w_ax = x.ndim - 3, x.ndim - 2
    h, w = x.shape[h_ax], x.shape[w_ax]
    th, tw = shape

    def fast_axis(y, axis, src, dst):
        if dst == src:
            return y
        if dst > src and dst % src == 0:
            return jnp.repeat(y, dst // src, axis=axis)
        if src % dst == 0:
            f = src // dst
            idx = [slice(None)] * y.ndim
            idx[axis] = slice(f // 2, None, f)
            return y[tuple(idx)]
        return None

    yh = fast_axis(x, h_ax, h, th)
    if yh is not None:
        yw = fast_axis(yh, w_ax, w, tw)
        if yw is not None:
            return yw

    if x.ndim == 4:
        out_shape = (x.shape[0], *shape, x.shape[3])
    else:
        out_shape = (*shape, x.shape[-1])
    return jax.image.resize(x, out_shape, method="nearest")
