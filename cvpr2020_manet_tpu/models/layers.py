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
    elif norm == "frozen":
        def ctor(name=None):
            return FrozenAffine(dtype=dtype, name=name)
    else:
        raise ValueError(f"unknown norm {norm!r}")
    return ctor


def resize_bilinear(x: jax.Array, shape: tuple[int, int]) -> jax.Array:
    """Bilinear resize of NHWC (or HWC) to spatial `shape`.

    Half-pixel-center semantics (torch align_corners=False equivalent).
    """
    if x.ndim == 4:
        out_shape = (x.shape[0], *shape, x.shape[3])
    else:
        out_shape = (*shape, x.shape[-1])
    return jax.image.resize(x, out_shape, method="bilinear").astype(x.dtype)


def resize_nearest(x: jax.Array, shape: tuple[int, int]) -> jax.Array:
    """Nearest resize — for label/mask maps (no label bleeding)."""
    if x.ndim == 4:
        out_shape = (x.shape[0], *shape, x.shape[3])
    else:
        out_shape = (*shape, x.shape[-1])
    return jax.image.resize(x, out_shape, method="nearest")
