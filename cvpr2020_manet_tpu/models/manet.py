"""MANet core model (SURVEY.md C2, parity with ref:networks/IntVOS.py).

One Flax module exposing the reference's four capabilities as methods
(invoked via `apply(..., method=...)` from jitted engine code):

- `extract_features` ~ IntVOS.extract_feature — the once-per-video encoder
- `interact`         ~ IntVOS.int_seghead    — scribble branch
- `aggregate_memory` ~ the MA module          — gated round fusion
- `propagate`        ~ IntVOS.prop_seghead    — matching + decoder, one frame

Conventions (TPU static-shape policy):
- object axis O = cfg.max_objects + 1, index 0 is background; invalid
  (padding) objects are masked by `obj_valid` with -inf logits.
- per-object *maps* are channels-last (H, W, O); per-object *features*
  are object-folded-into-batch (O, H, W, C) so conv heads share weights
  across any object count without recompiles.
- everything operates at feature stride (H/4, W/4); upsampling to image
  resolution happens in the engine.
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from cvpr2020_manet_tpu.config import ModelConfig
from cvpr2020_manet_tpu.models.encoder import Encoder
from cvpr2020_manet_tpu.models.heads import (
    DynamicSegHead, InteractionHead, MemoryAggregator)
from cvpr2020_manet_tpu.models.layers import resize_bilinear, resize_nearest
from cvpr2020_manet_tpu.ops import matching as M


def _fold_maps(maps: jax.Array) -> jax.Array:
    """(H, W, O) -> (O, H, W, 1)."""
    return jnp.transpose(maps, (2, 0, 1))[..., None]


def _unfold_logits(logits: jax.Array) -> jax.Array:
    """(O, H, W, 1) -> (H, W, O)."""
    return jnp.transpose(logits[..., 0], (1, 2, 0))


class MANet(nn.Module):
    cfg: ModelConfig
    # "auto" | "jnp" | "pallas" | "pallas_interpret" (the Pallas kernels
    # run in interpreter mode — CPU-runnable parity tests of the
    # production TPU code path)
    matching_backend: str = "auto"
    # Training through the matching on the pallas backend: use the
    # custom-VJP argmin-routed kernels (ops/matching_pallas.
    # global_matching_trainable, ops/local_matching_pallas.
    # local_matching_trainable). Eval keeps the leaner plain kernels.
    trainable_matching: bool = False

    def setup(self):
        cfg = self.cfg
        dtype = jnp.dtype(cfg.dtype)
        self.encoder = Encoder(cfg, name="encoder")
        head_norm = getattr(cfg, "head_norm", cfg.norm)
        self.int_head = InteractionHead(
            head_channels=cfg.head_channels, ma_channels=cfg.ma_channels,
            norm=head_norm, gn_groups=cfg.gn_groups, dtype=dtype,
            name="interaction_head")
        self.seg_head = DynamicSegHead(
            head_channels=cfg.head_channels, norm=head_norm,
            gn_groups=cfg.gn_groups, dtype=dtype, name="propagation_head")
        self.memory = MemoryAggregator(
            ma_channels=cfg.ma_channels, dtype=dtype, name="memory_aggregator")

    # ------------------------------------------------------------------ #

    def __call__(self, images, scribbles, prev_masks):
        """Init-only path: touches every parameter once.

        images (B, H, W, 3); scribbles/prev_masks (B, H/4, W/4, O).
        """
        feat, emb = self.encoder(images)
        o = scribbles.shape[-1]
        f0, e0 = feat[0], emb[0]
        int_feats, int_logits = self._interact(
            f0, scribbles[0], 1.0 - scribbles[0], prev_masks[0])
        mem = self.memory(int_feats, jnp.zeros_like(int_feats), True)
        ref_onehot = scribbles[0].reshape(-1, o)
        logits, gmap = self._propagate(
            f0, e0, e0.reshape(-1, e0.shape[-1]), ref_onehot, None,
            jnp.ones_like(scribbles[0]), e0, prev_masks[0], mem,
            jnp.ones((o,), jnp.float32))
        return int_logits, logits, gmap

    # ------------------------------------------------------------------ #

    def extract_features(self, images: jax.Array) -> Tuple[jax.Array, jax.Array]:
        """(B, H, W, 3) -> feature (B, h, w, Cd), embedding (B, h, w, Ce_pad)."""
        return self.encoder(images)

    # ------------------------------------------------------------------ #

    def interact(self, feature, pos_scr, neg_scr, prev_mask):
        return self._interact(feature, pos_scr, neg_scr, prev_mask)

    def _interact(self, feature, pos_scr, neg_scr, prev_mask):
        """Scribble branch on the annotated frame.

        feature (h, w, Cd); pos_scr/neg_scr/prev_mask (h, w, O) — per-object
        positive scribble rasters, negative rasters (other objects' + bg
        scribbles), previous-round probabilities.
        Returns (interaction features (O, h, w, Cma), logits (h, w, O)).
        """
        o = pos_scr.shape[-1]
        f = jnp.broadcast_to(feature[None], (o, *feature.shape))
        x = jnp.concatenate(
            [f.astype(feature.dtype),
             _fold_maps(pos_scr).astype(feature.dtype),
             _fold_maps(neg_scr).astype(feature.dtype),
             _fold_maps(prev_mask).astype(feature.dtype)], axis=-1)
        int_feats, logits = self.int_head(x)
        return int_feats, _unfold_logits(logits)

    # ------------------------------------------------------------------ #

    def aggregate_memory(self, int_feats, memory, is_first_round):
        """Gated fusion of this round's interaction features (O, h, w, Cma)."""
        return self.memory(int_feats, memory, is_first_round)

    # ------------------------------------------------------------------ #

    def propagate(self, feature_t, emb_t, ref_emb, ref_onehot, ref_valid,
                  global_map_prev, prev_emb, prev_mask, int_memory, obj_valid,
                  gmap_override=None, head_pre=None):
        return self._propagate(
            feature_t, emb_t, ref_emb, ref_onehot, ref_valid,
            global_map_prev, prev_emb, prev_mask, int_memory, obj_valid,
            gmap_override=gmap_override, head_pre=head_pre)

    # -- decomposed head stage 1 (eval fast path) ----------------------- #
    #
    # The propagation head's first conv is LINEAR in its input, and two of
    # its three input blocks are constant within a round: the backbone
    # feature block is fixed per sequence and the MA memory block per
    # round (SURVEY.md C5/C6). Precomputing those blocks' conv0
    # contributions once per round (head_feat_contrib over all frames,
    # head_mem_contrib over objects) leaves only the tiny 3-channel maps
    # conv per frame — cutting the per-frame head FLOPs ~55% and dropping
    # the per-object broadcast of the feature block. Exact up to float
    # summation order (golden-tested vs the fused path).

    def _head_conv0_slice(self, x, lo, hi):
        """conv0 applied to input-channel range [lo, hi) of the stage-1
        kernel. x (..., h, w, hi-lo) -> (..., h, w, C), model dtype."""
        k = self.seg_head.variables["params"]["stack"]["conv0"]["kernel"]
        dtype = jnp.dtype(self.cfg.dtype)
        batched = x if x.ndim == 4 else x[None]
        y = jax.lax.conv_general_dilated(
            batched.astype(dtype), k[:, :, lo:hi, :].astype(dtype),
            window_strides=(1, 1), padding="SAME",
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            preferred_element_type=jnp.float32)
        y = y.astype(dtype)
        return y if x.ndim == 4 else y[0]

    def head_feat_contrib(self, feat):
        """(T, h, w, Cd) backbone features -> their conv0 contribution."""
        return self._head_conv0_slice(feat, 0, self.cfg.decoder_channels)

    def head_mem_contrib(self, int_memory):
        """(O, h, w, Cma) MA memory -> its conv0 contribution."""
        cf = self.cfg.decoder_channels
        return self._head_conv0_slice(
            int_memory, cf + 3, cf + 3 + self.cfg.ma_channels)

    def _propagate(self, feature_t, emb_t, ref_emb, ref_onehot, ref_valid,
                   global_map_prev, prev_emb, prev_mask, int_memory,
                   obj_valid, gmap_override=None, head_pre=None):
        """Propagation branch for one frame.

        feature_t (h, w, Cd), emb_t (h, w, Ce): current frame.
        ref_emb (Nk, Ce), ref_onehot (Nk, O), ref_valid (Nk,) | None:
            flattened matching memory (annotated-frame pixels, possibly
            stacked over rounds — SURVEY.md C3/C8).
        global_map_prev (h, w, O): running elementwise-min global map
            memory for THIS frame (ones on round 0).
        prev_emb (h, w, Ce), prev_mask (h, w, O): previous frame in the
            sweep and its predicted probabilities (local matching input).
        int_memory (O, h, w, Cma): aggregated interaction features.
        obj_valid (O,): 1 for live objects (index 0 = background, live).
        gmap_override (h, w, O) | None: externally computed global matching
            map (e.g. context-parallel matching, parallel/cp_matching.py);
            skips the internal matching when given.

        Returns (logits (h, w, O) float32, fused global map (h, w, O)).
        """
        cfg = self.cfg
        h, w, ce = emb_t.shape
        o = global_map_prev.shape[-1]

        if gmap_override is not None:
            gm = gmap_override
        else:
            gm = self._global_matching(
                emb_t.reshape(-1, ce), ref_emb, ref_onehot, ref_valid)
            gm = gm.reshape(h, w, o)
        gm = jnp.minimum(gm, global_map_prev)          # C8 min-fusion

        # Local matching against the previous frame's *predicted labels*
        # (hard argmax of its probabilities), optionally at reduced
        # resolution (reference downsamples local matching to save compute).
        prev_labels = jnp.argmax(prev_mask, axis=-1)
        prev_onehot = jax.nn.one_hot(prev_labels, o, dtype=jnp.float32)
        s = cfg.local_downsample
        if s > 1:
            q = resize_bilinear(emb_t, (h // s, w // s))
            k = resize_bilinear(prev_emb, (h // s, w // s))
            m = resize_nearest(prev_onehot, (h // s, w // s))
            lm = self._local_matching(q, k, m)
            lm = resize_bilinear(lm, (h, w))
        else:
            lm = self._local_matching(emb_t, prev_emb, prev_onehot)

        # Assemble per-object decoder inputs (SURVEY.md C5,
        # ~calculate_attention_head).
        dtype = feature_t.dtype
        if head_pre is not None:
            # decomposed stage 1: feature/memory conv0 contributions were
            # precomputed by the caller (head_pre); only the 3 per-frame
            # map channels go through conv0 here
            maps = jnp.concatenate(
                [_fold_maps(gm), _fold_maps(lm), _fold_maps(prev_mask)],
                axis=-1).astype(dtype)                       # (O, h, w, 3)
            cf = cfg.decoder_channels
            pre0 = self._head_conv0_slice(maps, cf, cf + 3) \
                + head_pre.astype(dtype)
            logits = _unfold_logits(self.seg_head(None, pre0=pre0))
            logits = logits + (1.0 - obj_valid)[None, None, :] * (-1e9)
            return logits, gm
        f = jnp.broadcast_to(feature_t[None], (o, *feature_t.shape))
        x = jnp.concatenate(
            [f,
             _fold_maps(gm).astype(dtype),
             _fold_maps(lm).astype(dtype),
             _fold_maps(prev_mask).astype(dtype),
             int_memory.astype(dtype)], axis=-1)
        logits = _unfold_logits(self.seg_head(x))       # (h, w, O) f32
        logits = logits + (1.0 - obj_valid)[None, None, :] * (-1e9)
        return logits, gm

    # ------------------------------------------------------------------ #

    def _backend(self) -> str:
        backend = self.matching_backend
        if backend == "auto":
            backend = "pallas" if jax.default_backend() == "tpu" else "jnp"
        return backend

    def _global_matching(self, query, ref_emb, ref_onehot, ref_valid):
        backend = self._backend()
        if backend.startswith("pallas"):
            interp = backend.endswith("_interpret")
            if "int8" in backend and not self.trainable_matching:
                # opt-in serving mode: int8 cross term on the MXU's
                # double-rate path (ops/matching_pallas.py); training
                # (trainable_matching) always stays full precision
                from cvpr2020_manet_tpu.ops.matching_pallas import (
                    global_matching_pallas_int8)
                return global_matching_pallas_int8(
                    query, ref_emb, ref_onehot, ref_valid, interpret=interp)
            if self.trainable_matching and not interp:
                from cvpr2020_manet_tpu.ops.matching_pallas import (
                    global_matching_trainable)
                gate = ref_onehot
                if ref_valid is not None:
                    gate = gate * ref_valid.astype(gate.dtype)[:, None]
                return global_matching_trainable(query, ref_emb, gate)
            from cvpr2020_manet_tpu.ops.matching_pallas import (
                global_matching_pallas)
            return global_matching_pallas(query, ref_emb, ref_onehot,
                                          ref_valid, interpret=interp)
        return M.global_matching(query, ref_emb, ref_onehot, ref_valid)

    def _local_matching(self, query, prev, prev_onehot):
        # local matching stays full-precision under the int8 backend: it
        # is <1% of round device time (docs/BENCHMARKS.md stage table)
        backend = self._backend()
        if backend.startswith("pallas"):
            interp = backend.endswith("_interpret")
            if self.trainable_matching and not interp:
                from cvpr2020_manet_tpu.ops.local_matching_pallas import (
                    local_matching_trainable)
                return local_matching_trainable(query, prev, prev_onehot,
                                                self.cfg.local_window)
            from cvpr2020_manet_tpu.ops.local_matching_pallas import (
                local_matching_pallas)
            return local_matching_pallas(query, prev, prev_onehot,
                                         window=self.cfg.local_window,
                                         interpret=interp)
        return M.local_matching(query, prev, prev_onehot,
                                window=self.cfg.local_window)
