"""DeepLabV3+ encoder with pixel-embedding head (Flax, NHWC).

Capability parity with ref:networks/deeplab/{aspp,decoder,deeplab}.py +
the ~100-d embedding conv in ref:networks/IntVOS.py (expected paths,
SURVEY.md C9, §3.2): ResNet trunk -> ASPP (rates 6/12/18 + image pooling)
-> decoder fusing the stride-4 low-level feature -> stride-4 `feature`
map (decoder_channels) and `embedding` map (embedding_dim).

The embedding is zero-padded to `embedding_dim_padded` (lane multiple of
128) so the Pallas matching kernel sees aligned tiles; zero-padding adds
exactly 0 to every squared distance, so matching semantics are unchanged.

This module is THE once-per-video cost: the interactive loop extracts
features for all frames once and caches them in HBM (SURVEY.md §1,
"shared encoder, run ONCE per video").
"""

from __future__ import annotations

import math
from typing import Any, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from cvpr2020_manet_tpu.config import ModelConfig
from cvpr2020_manet_tpu.models.layers import make_norm, resize_bilinear
from cvpr2020_manet_tpu.models.resnet import ResNetBackbone


class ASPP(nn.Module):
    """Atrous spatial pyramid pooling @ output stride 16."""

    channels: int = 256
    rates: Tuple[int, ...] = (6, 12, 18)
    norm: str = "gn"
    gn_groups: int = 32
    dtype: Any = jnp.bfloat16

    @nn.compact
    def __call__(self, x):
        norm_ctor = make_norm(self.norm, self.dtype, self.gn_groups)
        branches = []
        y = nn.Conv(self.channels, (1, 1), use_bias=False, dtype=self.dtype)(x)
        branches.append(nn.relu(norm_ctor()(y)))
        for r in self.rates:
            y = nn.Conv(self.channels, (3, 3),
                        kernel_dilation=(r, r), padding=[(r, r), (r, r)],
                        use_bias=False, dtype=self.dtype)(x)
            branches.append(nn.relu(norm_ctor()(y)))
        # Image-level pooling branch: global mean -> 1x1 conv -> broadcast.
        pooled = jnp.mean(x, axis=(1, 2), keepdims=True)
        pooled = nn.Conv(self.channels, (1, 1), use_bias=False,
                         dtype=self.dtype)(pooled)
        pooled = nn.relu(make_norm("gn", self.dtype, 1)()(pooled))
        branches.append(jnp.broadcast_to(
            pooled, (*x.shape[:3], self.channels)))
        y = jnp.concatenate(branches, axis=-1)
        y = nn.Conv(self.channels, (1, 1), use_bias=False, dtype=self.dtype)(y)
        return nn.relu(norm_ctor()(y))


class Encoder(nn.Module):
    """image (B, H, W, 3) -> (feature (B,H/4,W/4,Cd), embedding (B,H/4,W/4,Ce_pad))."""

    cfg: ModelConfig

    @nn.compact
    def __call__(self, x) -> Tuple[jax.Array, jax.Array]:
        cfg = self.cfg
        dtype = jnp.dtype(cfg.dtype)
        norm_ctor = make_norm(cfg.norm, dtype, cfg.gn_groups)

        low, trunk = ResNetBackbone(
            depths=cfg.backbone_depths, width=cfg.backbone_width,
            output_stride=cfg.output_stride, norm=cfg.norm,
            gn_groups=cfg.gn_groups, dtype=dtype, name="backbone")(x)

        y = ASPP(channels=cfg.aspp_channels, norm=cfg.norm,
                 gn_groups=cfg.gn_groups, dtype=dtype, name="aspp")(trunk)

        # Decoder: upsample ASPP to stride 4, fuse projected low-level feat.
        y = resize_bilinear(y, low.shape[1:3])
        ll = nn.Conv(cfg.low_level_channels, (1, 1), use_bias=False,
                     dtype=dtype, name="low_level_proj")(low)
        ll_groups = math.gcd(cfg.gn_groups, cfg.low_level_channels)
        ll = nn.relu(make_norm(cfg.norm, dtype, ll_groups)()(ll))
        y = jnp.concatenate([y, ll], axis=-1)
        for i in range(2):
            y = nn.Conv(cfg.decoder_channels, (3, 3), use_bias=False,
                        dtype=dtype, name=f"decoder_conv{i}")(y)
            y = nn.relu(norm_ctor()(y))
        feature = y

        # Pixel-embedding head (matching space), padded to lane multiple.
        emb = nn.Conv(cfg.embedding_dim, (1, 1), dtype=dtype,
                      name="embedding_head")(feature)
        if cfg.embedding_dim_padded > cfg.embedding_dim:
            pad = cfg.embedding_dim_padded - cfg.embedding_dim
            emb = jnp.pad(emb, ((0, 0), (0, 0), (0, 0), (0, pad)))
        return feature, emb
