"""Dilated ResNet backbone (Flax, NHWC) — DeepLabV3+ encoder trunk.

Capability parity with ref:networks/deeplab/backbone/resnet.py (expected
path, SURVEY.md C9): ResNet-101 bottleneck trunk, output stride 16 via a
dilated final stage, exposing the stride-4 stage-1 output as the low-level
feature for the DeepLabV3+ decoder.

TPU-first choices: NHWC layout (XLA's preferred conv layout), bfloat16
activations with float32 params, GroupNorm default (see models/layers.py),
stages unrolled statically (block counts are config constants, so the
whole trunk is one fused XLA graph).
"""

from __future__ import annotations

from typing import Any, Sequence, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from cvpr2020_manet_tpu.models.layers import make_norm


class Bottleneck(nn.Module):
    """1x1 -> 3x3 -> 1x1 bottleneck with projection shortcut."""

    channels: int          # bottleneck width; output is channels * 4
    strides: int = 1
    dilation: int = 1
    norm: str = "gn"
    gn_groups: int = 32
    dtype: Any = jnp.bfloat16

    @nn.compact
    def __call__(self, x):
        norm_ctor = make_norm(self.norm, self.dtype, self.gn_groups)
        out_ch = self.channels * 4
        residual = x
        y = nn.Conv(self.channels, (1, 1), use_bias=False, dtype=self.dtype,
                    name="conv1")(x)
        y = norm_ctor(name="norm1")(y)
        y = nn.relu(y)
        y = nn.Conv(
            self.channels, (3, 3),
            strides=(self.strides, self.strides),
            kernel_dilation=(self.dilation, self.dilation),
            padding=[(self.dilation, self.dilation)] * 2,
            use_bias=False, dtype=self.dtype, name="conv2")(y)
        y = norm_ctor(name="norm2")(y)
        y = nn.relu(y)
        y = nn.Conv(out_ch, (1, 1), use_bias=False, dtype=self.dtype,
                    name="conv3")(y)
        y = norm_ctor(name="norm3")(y)
        if residual.shape[-1] != out_ch or self.strides != 1:
            residual = nn.Conv(
                out_ch, (1, 1), strides=(self.strides, self.strides),
                use_bias=False, dtype=self.dtype, name="shortcut")(x)
            residual = norm_ctor(name="shortcut_norm")(residual)
        return nn.relu(y + residual)


class ResNetBackbone(nn.Module):
    """Returns (low_level_feat @ stride 4, trunk_feat @ output_stride)."""

    depths: Sequence[int] = (3, 4, 23, 3)   # ResNet-101
    width: int = 64
    output_stride: int = 16
    norm: str = "gn"
    gn_groups: int = 32
    dtype: Any = jnp.bfloat16

    @nn.compact
    def __call__(self, x) -> Tuple[jax.Array, jax.Array]:
        assert self.output_stride in (8, 16)
        norm_ctor = make_norm(self.norm, self.dtype, self.gn_groups)
        x = x.astype(self.dtype)
        # Stem: 7x7/2 conv + 3x3/2 maxpool -> stride 4
        x = nn.Conv(self.width, (7, 7), strides=(2, 2),
                    padding=[(3, 3), (3, 3)], use_bias=False,
                    dtype=self.dtype, name="stem_conv")(x)
        x = norm_ctor(name="stem_norm")(x)
        x = nn.relu(x)
        x = nn.max_pool(x, (3, 3), strides=(2, 2), padding=[(1, 1), (1, 1)])

        # (stride, dilation) per stage for the requested output stride
        if self.output_stride == 16:
            stage_cfg = [(1, 1), (2, 1), (2, 1), (1, 2)]
        else:  # output_stride == 8
            stage_cfg = [(1, 1), (2, 1), (1, 2), (1, 4)]

        low_level = None
        for stage, (n_blocks, (stride, dilation)) in enumerate(
                zip(self.depths, stage_cfg)):
            ch = self.width * (2 ** stage)
            for b in range(n_blocks):
                # Multi-grid (1,2,4) in the final dilated stage, standard
                # DeepLab practice for the dilated ResNet trunk.
                mg = (1, 2, 4)[min(b, 2)] if (dilation > 1) else 1
                x = Bottleneck(
                    channels=ch,
                    strides=stride if b == 0 else 1,
                    dilation=dilation * mg,
                    norm=self.norm, gn_groups=self.gn_groups,
                    dtype=self.dtype,
                    name=f"stage{stage + 1}_block{b}")(x)
            if stage == 0:
                low_level = x   # stride 4, width*4 channels
        return low_level, x
