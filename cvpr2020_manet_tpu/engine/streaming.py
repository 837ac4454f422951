"""Streaming iVOS serving (BASELINE config 5: 1080p, unbounded memory).

Online contract — no full-video feature cache, frames arrive one at a
time:

  s = StreamingIVOS(cfg, model, variables)
  s.reset(num_objects)
  mask = s.observe(frame)            # segment the newest frame (sync)
  fut  = s.observe_async(frame)      # pipelined: returns a mask Future
  mask = s.correct(scribbles_json)   # user corrects the NEWEST frame

State kept on device between calls:
- paged matching memory: annotated-frame pixels of every correction so
  far, in fixed-capacity pages (cfg.eval.max_interactions x HW rows) —
  the Pallas kernel streams all pages per frame (ops/matching_pallas);
  page count is the 'unbounded memory growth' axis and shards over the
  'context' mesh axis at scale (parallel/cp_matching.py).
- gated interaction-feature memory (MA module), previous frame
  embedding + probabilities for local matching.

Pipelining (the config-5 perf pass): `observe_async` issues the upload
and the jitted dispatch (both asynchronous), hands the packed-mask
download to a thread pool, and returns a Future — so frame i's mask
transfer rides UNDER frame i+1..'s upload and device compute, and
steady-state throughput approaches max(upload, compute, download)
instead of their sum. `observe` is `observe_async(...).result()` — same
masks, serialized timing. Masks are bit-packed at the LIVE label count
(1 bit/px for 1-object streams) before the transfer; the device state
carried between frames never leaves HBM.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from cvpr2020_manet_tpu.config import Config
from cvpr2020_manet_tpu.engine.evaluator import (
    downsample_mask_max, pad_image_to)
from cvpr2020_manet_tpu.interactive.scribbles import (
    annotated_frames, scribble_masks_per_object, scribbles2mask)
from cvpr2020_manet_tpu.models.layers import resize_bilinear
from cvpr2020_manet_tpu.models.manet import MANet


class StreamingIVOS:
    def __init__(self, cfg: Config, model: MANet, variables, cp_mesh=None):
        """cp_mesh: optional ('data','context') mesh — the LIVE memory
        pages shard over 'context' and each device matches its shard on
        the production backend, combined with an all-gather-min
        (parallel/cp_matching.py). The capacity scaling story for
        unbounded corrections at 1080p (BASELINE config 5)."""
        self.cfg = cfg
        self.model = model
        self.variables = variables
        self.cp_mesh = cp_mesh
        self.o = cfg.model.max_objects + 1
        self.stride = cfg.model.feature_stride
        h, w = cfg.eval.image_size
        self.hp = h + (-h) % cfg.eval.pad_to
        self.wp = w + (-w) % cfg.eval.pad_to
        # state grids live at the decoder's output stride (== 4,
        # validated by ModelConfig.__post_init__)
        self.hh, self.ww = self.hp // self.stride, self.wp // self.stride
        self.capacity = cfg.eval.max_interactions
        backend = model.matching_backend
        if backend == "auto":
            backend = "pallas" if jax.default_backend() == "tpu" else "jnp"
        self.use_pallas = backend.startswith("pallas")
        if "int8" in backend and cp_mesh is not None:
            # cp_matching has no int8 fold (same wall the Evaluator and
            # the eval_davis CLI enforce) — refuse rather than silently
            # running f32 context-parallel matching
            raise ValueError(
                "matching_backend 'pallas_int8' does not compose with "
                "context-parallel streaming (cp_mesh); use the f32 "
                "backend")
        from cvpr2020_manet_tpu.parallel.cp_matching import cp_backend
        self._cp_backend = cp_backend(self.use_pallas,
                                      backend == "pallas_interpret")
        # n_rows static: the matching memory is sliced to the LIVE page
        # count before matching (one cached compile per power-of-2 page
        # bucket) — a stream that has seen 1 correction matches 1 page,
        # not capacity pages (8x less matching FLOPs + bucketing sort)
        # bits static too: reset() can change the live mask bit depth
        # without changing any traced shape, so it must key the trace
        # (a cached trace with stale pack bits + fresh unpack bits
        # produced wrong-width masks)
        self._observe = jax.jit(self._observe_impl,
                                static_argnames=("n_rows", "bits"))
        self._correct = jax.jit(self._correct_impl,
                                static_argnames=("bits",))
        self.state = None
        from cvpr2020_manet_tpu.engine.evaluator import _FETCH_POOL
        self._fetch_pool = _FETCH_POOL

    # ------------------------------------------------------------------ #

    def reset(self, num_objects: int) -> None:
        if not 0 < num_objects <= self.cfg.model.max_objects:
            # silently accepting an over-budget stream would DROP the
            # extra objects' scribbles from the positive channels while
            # still counting them as negatives — actively wrong memory
            raise ValueError(
                f"num_objects={num_objects} outside 1..="
                f"{self.cfg.model.max_objects} (ModelConfig.max_objects)")
        hh, ww = self.hh, self.ww
        # object bucket + mask bit depth: the evaluator's exact policies
        # (shared helpers — the compile caches and pack widths of the two
        # engines must not drift)
        from cvpr2020_manet_tpu.engine.evaluator import (
            aligned_mask_bits, object_bucket_for)
        o = object_bucket_for(num_objects, self.o)
        self._o_bucket = o
        self._bits = aligned_mask_bits(num_objects + 1, self.wp)
        m = self.capacity * hh * ww
        obj_valid = np.zeros((o,), np.float32)
        obj_valid[:num_objects + 1] = 1.0
        self.state = dict(
            mem_emb=jnp.zeros((m, self.cfg.model.embedding_dim_padded),
                              jnp.float32),
            mem_onehot=jnp.zeros((m, o), jnp.float32),
            rounds=0,
            int_mem=jnp.zeros((o, hh, ww, self.cfg.model.ma_channels),
                              jnp.float32),
            prev_emb=jnp.zeros((hh, ww, self.cfg.model.embedding_dim_padded),
                               jnp.float32),
            prev_probs=jnp.zeros((hh, ww, o), jnp.float32).at[..., 0].set(1.0),
            cur_feat=None, cur_emb=None, cur_probs=None,
            obj_valid=jnp.asarray(obj_valid),
            # decomposed head stage 1 (models/manet.py): the MA memory's
            # conv0 contribution changes only on correct(); conv0 of the
            # zero-initialized memory is exactly zero (no bias)
            head_mem_pre=jnp.zeros(
                (o, hh, ww, self.cfg.model.head_channels),
                jnp.dtype(self.cfg.model.dtype)),
        )

    # ------------------------------------------------------------------ #

    def _zero_padded_border(self, image):
        """Re-zero the padded border AFTER normalization so every ingest
        path feeds the encoder identical (zero = ImageNet-mean) padding."""
        h_img, w_img = self.cfg.eval.image_size
        if h_img < self.hp:
            image = image.at[h_img:, :, :].set(0.0)
        if w_img < self.wp:
            image = image.at[:, w_img:, :].set(0.0)
        return image

    def _observe_impl(self, image, mem_emb, mem_onehot, int_mem,
                      prev_emb, prev_probs, obj_valid, has_memory,
                      head_mem_pre, *, n_rows, bits):
        model, variables = self.model, self.variables
        o = mem_onehot.shape[-1]
        # matching memory restricted to the live pages (pages fill in
        # round order, so the live rows are a prefix)
        mem_emb = jax.lax.slice_in_dim(mem_emb, 0, n_rows)
        mem_onehot = jax.lax.slice_in_dim(mem_onehot, 0, n_rows)
        if image.ndim == 1:
            # planar YUV 4:2:0 ingest, packed into ONE flat uint8 buffer
            # (y plane then uv plane) by observe_async: 1.5 bytes/px —
            # half of uint8 RGB, 16x less than f32 — in a single
            # transfer RPC (two per-plane device_puts pay the link RTT
            # twice). The format video decoders emit natively
            # (utils/ingest.py); BT.601 inverse + normalize fuse into
            # the first conv.
            from cvpr2020_manet_tpu.data.davis import (
                IMAGENET_MEAN, IMAGENET_STD)
            from cvpr2020_manet_tpu.utils.ingest import yuv420_to_rgb
            hp, wp = self.hp, self.wp
            y = image[: hp * wp].reshape(hp, wp)
            uv = image[hp * wp:].reshape(hp // 2, wp // 2, 2)
            image = yuv420_to_rgb(y, uv) / 255.0
            image = (image - jnp.asarray(IMAGENET_MEAN)) \
                / jnp.asarray(IMAGENET_STD)
            image = self._zero_padded_border(image)
        elif image.dtype == jnp.uint8:
            # uint8 ingest + device-side normalize: a float32 1080p frame
            # is 25 MB over the host link, uint8 is 6. Re-zero the padded
            # border AFTER normalization so both ingest paths feed the
            # encoder identical (zero = ImageNet-mean) padding — raw zero
            # bytes would normalize to ~-2.1 sigma "black".
            from cvpr2020_manet_tpu.engine.propagate_batch import (
                preprocess_frames)
            image = preprocess_frames(image)
            image = self._zero_padded_border(image)
        feat, emb = model.apply(variables, image[None],
                                method=model.extract_features)
        f_t, e_t = feat[0], emb[0]
        head_fp = model.apply(variables, f_t,
                              method=model.head_feat_contrib)
        gmap_override = None
        if self.cp_mesh is not None:
            from cvpr2020_manet_tpu.parallel.cp_matching import cp_match_flat
            ce = e_t.shape[-1]
            gmap_override = cp_match_flat(
                e_t.reshape(-1, ce), mem_emb, mem_onehot,
                self.cp_mesh, self._cp_backend).reshape(self.hh, self.ww, o)
        logits, _ = model.apply(
            variables, f_t, e_t, mem_emb, mem_onehot, None,
            jnp.ones((self.hh, self.ww, o), jnp.float32),
            prev_emb, prev_probs, int_mem, obj_valid,
            method=model.propagate, gmap_override=gmap_override,
            head_pre=head_fp[None] + head_mem_pre)
        logits = logits + (1.0 - obj_valid)[None, None, :] * (-1e9)
        probs = jax.nn.softmax(logits, axis=-1)
        # before any correction there is no memory: everything background
        probs = jnp.where(has_memory, probs,
                          jnp.zeros_like(probs).at[..., 0].set(1.0))
        mask = self._mask(probs, bits)
        return f_t, e_t, probs, mask

    def _correct_impl(self, cur_feat, cur_emb, cur_probs, pos, neg,
                      mem_emb, mem_onehot, int_mem, obj_valid, round_idx,
                      is_first, *, bits):
        model, variables = self.model, self.variables
        o = mem_onehot.shape[-1]
        int_feats, int_logits = model.apply(
            variables, cur_feat, pos, neg, cur_probs, method=model.interact)
        int_mem = model.apply(variables, int_feats, int_mem, is_first,
                              method=model.aggregate_memory)
        int_logits = int_logits + (1.0 - obj_valid)[None, None, :] * (-1e9)
        probs = jax.nn.softmax(int_logits, axis=-1)
        lab = jnp.argmax(probs, axis=-1)
        scribbled = jnp.max(pos, axis=-1) > 0
        lab = jnp.where(scribbled, jnp.argmax(pos, axis=-1), lab)
        onehot = jax.nn.one_hot(lab.reshape(-1), o) * obj_valid[None, :]
        ref = cur_emb.reshape(-1, cur_emb.shape[-1]).astype(mem_emb.dtype)
        off = round_idx * ref.shape[0]
        mem_emb = jax.lax.dynamic_update_slice(mem_emb, ref, (off, 0))
        mem_onehot = jax.lax.dynamic_update_slice(mem_onehot, onehot, (off, 0))
        mask = self._mask(probs, bits)
        head_mem_pre = model.apply(variables, int_mem,
                                   method=model.head_mem_contrib)
        return probs, mem_emb, mem_onehot, int_mem, mask, head_mem_pre

    def _mask(self, probs, bits):
        """Full-res argmax labels, BIT-PACKED for the transfer at the live
        label count (the raw int32 map is 8.3 MB at 1080p — ~0.8 s on the
        sandbox link; 2-bit packing is ~0.5 MB, 1-bit half that). `bits`
        is a static jit arg of the callers: reset() may change it with no
        traced-shape change."""
        from cvpr2020_manet_tpu.engine.evaluator import pack_labels
        up = resize_bilinear(probs, (self.hp, self.wp))
        lab = jnp.argmax(up, axis=-1).astype(jnp.uint8)
        return pack_labels(lab, bits)

    def _unpack(self, packed, bits: int) -> np.ndarray:
        # bits is bound at DISPATCH time: a reset() that changes the
        # stream's bit depth must not re-interpret masks still in flight
        from cvpr2020_manet_tpu.engine.evaluator import unpack_labels
        h, w = self.cfg.eval.image_size
        lab = unpack_labels(np.asarray(packed), bits)
        return lab[:h, :w].astype(np.int32)

    # ------------------------------------------------------------------ #

    def observe_async(self, image: np.ndarray):
        """Pipelined segmentation of a new frame: upload + dispatch are
        issued asynchronously, the packed-mask download runs on a thread
        pool, and the (H, W) int32 label map arrives via the returned
        Future — so this frame's mask transfer overlaps the NEXT frames'
        upload and device compute. The device-side state advances
        immediately (JAX arrays are futures), so calls can be issued
        back-to-back at device speed.

        image: (H, W, 3) uint8 raw RGB (preferred — 4x cheaper over the
        host link, normalized on device), float32 already
        ImageNet-normalized, or a planar YUV420 (y (H, W), uv
        (H/2, W/2, 2)) uint8 pair — the video decoder's native output at
        HALF the RGB bytes (utils/ingest.py)."""
        assert self.state is not None, "call reset(num_objects) first"
        st = self.state
        pad_to = self.cfg.eval.pad_to
        if isinstance(image, tuple):
            y, uv = image
            y = pad_image_to(y[..., None], pad_to)[..., 0]
            uv = pad_image_to(uv, pad_to // 2)
            # ONE flat buffer -> one transfer RPC (see _observe_impl)
            image = jnp.asarray(np.concatenate(
                [np.ascontiguousarray(y).reshape(-1),
                 np.ascontiguousarray(uv).reshape(-1)]))
        else:
            if image.dtype != np.uint8:
                image = image.astype(np.float32)
            image = jnp.asarray(pad_image_to(image, pad_to))
        f_t, e_t, probs, mask = self._observe(
            image, st["mem_emb"], st["mem_onehot"],
            st["int_mem"], st["prev_emb"], st["prev_probs"],
            st["obj_valid"], jnp.asarray(st["rounds"] > 0),
            st["head_mem_pre"],
            n_rows=self.live_pages() * self.hh * self.ww,
            bits=self._bits)
        st["prev_emb"], st["prev_probs"] = e_t, probs
        st["cur_feat"], st["cur_emb"], st["cur_probs"] = f_t, e_t, probs
        return self._fetch_pool.submit(self._unpack, mask, self._bits)

    def observe(self, image: np.ndarray) -> np.ndarray:
        """Synchronous observe: same masks as observe_async, serialized
        timing (upload + compute + download on the caller's thread)."""
        return self.observe_async(image).result()

    def live_pages(self) -> int:
        """Matching-memory pages actually holding data (power-of-2
        bucketed — see evaluator.live_page_bucket). Round count is host
        state, so this is static per call — the unbounded-memory axis
        only costs what it holds."""
        from cvpr2020_manet_tpu.engine.evaluator import live_page_bucket
        return live_page_bucket(self.state["rounds"], self.capacity)

    def correct(self, scribbles_json) -> np.ndarray:
        """User scribbles on the newest frame -> refreshed mask; the
        annotated pixels become a new matching-memory page."""
        st = self.state
        assert st["cur_feat"] is not None, "observe() a frame first"
        h, w = self.cfg.eval.image_size
        af = annotated_frames(scribbles_json)
        raster = scribbles2mask(scribbles_json, (h, w))[af[0] if af else 0]
        pos, neg = scribble_masks_per_object(raster, self._o_bucket - 1)
        pos = downsample_mask_max(pad_image_to(pos, self.cfg.eval.pad_to),
                                  self.stride)
        neg = downsample_mask_max(pad_image_to(neg, self.cfg.eval.pad_to),
                                  self.stride)
        r = min(st["rounds"], self.capacity - 1)
        probs, mem_emb, mem_onehot, int_mem, mask, head_mem_pre = \
            self._correct(
                st["cur_feat"], st["cur_emb"], st["cur_probs"],
                jnp.asarray(pos), jnp.asarray(neg),
                st["mem_emb"], st["mem_onehot"], st["int_mem"],
                st["obj_valid"],
                jnp.asarray(r, jnp.int32), jnp.asarray(st["rounds"] == 0),
                bits=self._bits)
        st.update(mem_emb=mem_emb, mem_onehot=mem_onehot, int_mem=int_mem,
                  cur_probs=probs, prev_probs=probs,
                  head_mem_pre=head_mem_pre)
        st["rounds"] += 1
        return self._unpack(mask, self._bits)
