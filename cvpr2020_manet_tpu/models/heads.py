"""Decoder heads + memory-aggregation module (SURVEY.md C5-C7).

Capability parity with ref:networks/IntVOS.py (expected path):
- `InteractionHead`  ~ int_seghead: [frame feature ⊕ pos scribbles ⊕ neg
  scribbles ⊕ previous-round mask] -> per-object interaction feature +
  refreshed logit for the annotated frame.
- `DynamicSegHead`   ~ prop decoder: [frame feature ⊕ global matching map ⊕
  local matching map ⊕ previous-frame mask ⊕ aggregated interaction
  memory] -> per-object logit.
- `MemoryAggregator` ~ the MA module: gated fusion
  m_r = w ⊙ f_r + (1-w) ⊙ m_{r-1}, w = sigmoid(conv([f_r, m_{r-1}])).

All heads share weights across objects: the object axis is folded into the
batch axis, so one conv program serves any padded object count — no
per-object recompiles (TPU static-shape policy, config.py).
"""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp
from flax import linen as nn

from cvpr2020_manet_tpu.models.layers import make_norm


class ConvStack(nn.Module):
    """Dense 3x3 conv stack.

    Measured on v5e: the object-folded head is HBM-BANDWIDTH-bound, not
    FLOPs-bound (even pure 1x1 stacks run at the same wall clock as 3x3;
    depthwise-separable 7x7 is *slower* — DW convs don't use the MXU).
    The perf lever is channel width (config head/ma/decoder channels), not
    kernel factorization, so keep the dense 3x3 of the reference's heads.
    """

    channels: int
    depth: int
    norm: str
    gn_groups: int
    dtype: Any

    @nn.compact
    def __call__(self, x, pre0=None):
        """pre0: optional precomputed conv0 PRE-activation (before norm).

        conv0 is linear, so callers whose inputs split into per-frame /
        per-round-constant blocks can precompute those blocks' conv0
        contributions once and hand in the sum (MANet.propagate's
        decomposed head path) — stage 1's norm+relu and the later stages
        run unchanged."""
        norm_ctor = make_norm(self.norm, self.dtype, self.gn_groups)
        for i in range(self.depth):
            if i == 0 and pre0 is not None:
                x = pre0.astype(self.dtype)
            else:
                x = nn.Conv(self.channels, (3, 3), use_bias=False,
                            dtype=self.dtype, name=f"conv{i}")(x)
            x = nn.relu(norm_ctor()(x))
        return x


class InteractionHead(nn.Module):
    """Object-folded interaction branch head.

    Input  (N, H, W, Cf + 3): feature ⊕ [pos_scr, neg_scr, prev_mask].
    Output (interaction_feature (N, H, W, Cma), logit (N, H, W, 1)).
    """

    head_channels: int
    ma_channels: int
    norm: str
    gn_groups: int
    dtype: Any

    @nn.compact
    def __call__(self, x):
        y = ConvStack(self.head_channels, 2, self.norm, self.gn_groups,
                      self.dtype, name="stack")(x)
        feat = nn.Conv(self.ma_channels, (3, 3), dtype=self.dtype,
                       name="int_feature")(y)
        logit = nn.Conv(1, (1, 1), dtype=jnp.float32,
                        name="logit")(nn.relu(feat))
        return feat, logit


class DynamicSegHead(nn.Module):
    """Object-folded propagation decoder head.

    Input  (N, H, W, Cf + 3 + Cma): feature ⊕ [global_map, local_map,
    prev_mask] ⊕ aggregated interaction memory.
    Output logit (N, H, W, 1), float32.
    """

    head_channels: int
    norm: str
    gn_groups: int
    dtype: Any

    @nn.compact
    def __call__(self, x, pre0=None):
        y = ConvStack(self.head_channels, 3, self.norm, self.gn_groups,
                      self.dtype, name="stack")(x, pre0=pre0)
        return nn.Conv(1, (1, 1), dtype=jnp.float32, name="logit")(y)


class MemoryAggregator(nn.Module):
    """Gated sum/EMA fusion of round interaction features (SURVEY.md C7).

    m_r = w ⊙ f_r + (1 - w) ⊙ m_{r-1}. On the first round (round_idx == 0)
    the memory is initialized to f_0 directly, matching the reference's
    eval-time behavior of seeding memory with the first interaction.
    """

    ma_channels: int
    dtype: Any

    @nn.compact
    def __call__(self, f_r, m_prev, is_first_round):
        gate_in = jnp.concatenate(
            [f_r.astype(self.dtype), m_prev.astype(self.dtype)], axis=-1)
        w = nn.sigmoid(nn.Conv(self.ma_channels, (3, 3), dtype=self.dtype,
                               name="gate")(gate_in))
        fused = w * f_r + (1.0 - w) * m_prev
        first = jnp.asarray(is_first_round, jnp.bool_)
        return jnp.where(first, f_r, fused)
