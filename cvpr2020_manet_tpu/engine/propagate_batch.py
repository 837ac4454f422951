"""Batched multi-sequence mask propagation (BASELINE config 4).

Offline propagation at YouTube-VOS scale: given B clips and their
first-frame object masks, propagate every clip's masks through time in ONE
jitted graph — preprocessing (uint8 -> normalize), feature extraction,
frame-0 interaction seeding, and the temporal scan are all device-side;
the host supplies raw frames and receives label maps.

This is the batch-throughput counterpart of the interactive evaluator: the
same model methods, vmapped over the sequence axis, scanned over time —
XLA turns the per-frame matching into B parallel Pallas kernel launches.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from cvpr2020_manet_tpu.config import Config
from cvpr2020_manet_tpu.data.davis import IMAGENET_MEAN, IMAGENET_STD
from cvpr2020_manet_tpu.models.layers import resize_bilinear
from cvpr2020_manet_tpu.models.manet import MANet


def preprocess_frames(frames: jax.Array) -> jax.Array:
    """Device-side preprocessing: uint8 (..., H, W, 3) -> normalized f32."""
    x = frames.astype(jnp.float32) / 255.0
    return (x - jnp.asarray(IMAGENET_MEAN)) / jnp.asarray(IMAGENET_STD)


class BatchPropagator:
    def __init__(self, cfg: Config, model: MANet, variables):
        self.cfg = cfg
        self.model = model
        self.variables = variables
        self.o = cfg.model.max_objects + 1
        self._run = jax.jit(self._run_impl)

    def _run_impl(self, frames_u8, first_masks, obj_valid):
        """frames_u8 (B, T, H, W, 3) uint8; first_masks (B, h, w) int32
        labels at feature resolution; obj_valid (B, O).
        Returns per-frame label maps (B, T, H, W) int32."""
        model, variables = self.model, self.variables
        o = self.o
        b, t, h_img, w_img, _ = frames_u8.shape

        images = preprocess_frames(frames_u8)
        feat, emb = model.apply(
            variables, images.reshape(b * t, h_img, w_img, 3),
            method=model.extract_features)
        hh, ww = feat.shape[1:3]
        feat = feat.reshape(b, t, hh, ww, -1)
        emb = emb.reshape(b, t, hh, ww, -1)

        def one_sequence(feat_s, emb_s, first_mask, ov):
            first_oh = jax.nn.one_hot(first_mask, o, dtype=jnp.float32)
            first_oh = first_oh * ov[None, None, :]
            # seed interaction memory from the given mask (round-0 style:
            # the GT/first mask stands in for scribbles — SURVEY.md §4.3)
            pos = first_oh
            scribbled = jnp.max(pos, axis=-1, keepdims=True)
            neg = (scribbled - pos) * ov[None, None, :]
            int_feats, _ = model.apply(
                variables, feat_s[0], pos, neg, first_oh,
                method=model.interact)
            int_mem = model.apply(
                variables, int_feats, jnp.zeros_like(int_feats), True,
                method=model.aggregate_memory)
            ref_emb = emb_s[0].reshape(-1, emb_s.shape[-1])
            ref_oh = first_oh.reshape(-1, o)

            def step(carry, xs):
                prev_probs, e_prev = carry
                f_t, e_t = xs
                logits, _ = model.apply(
                    variables, f_t, e_t, ref_emb, ref_oh, None,
                    jnp.ones((hh, ww, o), jnp.float32), e_prev, prev_probs,
                    int_mem, ov, method=model.propagate)
                probs = jax.nn.softmax(logits, axis=-1)
                return (probs, e_t), probs

            init = (first_oh, emb_s[0])
            _, probs_seq = jax.lax.scan(step, init, (feat_s[1:], emb_s[1:]))
            probs_seq = jnp.concatenate([first_oh[None], probs_seq], axis=0)
            return probs_seq                                   # (T, hh, ww, O)

        probs = jax.vmap(one_sequence)(feat, emb, first_masks, obj_valid)

        def upsample_frame(p):
            return jnp.argmax(resize_bilinear(p, (h_img, w_img)),
                              axis=-1).astype(jnp.int32)
        return jax.lax.map(upsample_frame,
                           probs.reshape(b * t, hh, ww, o)
                           ).reshape(b, t, h_img, w_img)

    def propagate(self, frames_u8: np.ndarray, first_masks: np.ndarray,
                  num_objects: np.ndarray) -> np.ndarray:
        """Host API. frames_u8 (B,T,H,W,3) uint8; first_masks (B,h,w) int
        at feature resolution; num_objects (B,)."""
        b = frames_u8.shape[0]
        obj_valid = np.zeros((b, self.o), np.float32)
        for i, n in enumerate(np.asarray(num_objects)):
            obj_valid[i, :int(n) + 1] = 1.0
        return np.asarray(self._run(
            jnp.asarray(frames_u8), jnp.asarray(first_masks),
            jnp.asarray(obj_valid)))
