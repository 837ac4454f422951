"""Interactive evaluation engine (SURVEY.md §4.1 call stack, TPU-native).

Reference flow (ref: eval script + IntVOS, expected): per sequence, extract
features ONCE; per round, run the interaction branch on the annotated
frame, then sweep the propagation branch bidirectionally outward from it,
min-fusing global maps and submitting full-video masks.

TPU-native design decisions:
- the WHOLE round (interaction + both propagation sweeps + memory updates)
  is ONE jitted function (`_round_step`) over static (T, h, w, O) buckets:
  no host round-trips inside a round; the scribble rasters are the only
  host->device transfer, the argmax label maps the only device->host one
  (BASELINE north-star).
- the dynamic annotated-frame index is handled with `jnp.roll` so both
  sweeps are fixed-length `lax.scan`s starting exactly at the annotated
  frame — one compilation serves every round/frame/sequence.
- per-frame global-map memory (T, h, w, O) and the aggregated interaction
  memory (O, h, w, Cma) live in HBM across rounds (SURVEY.md C7/C8).
"""

from __future__ import annotations

import concurrent.futures
import dataclasses
import time
from typing import Any, Dict

import jax
import jax.numpy as jnp
import numpy as np

from cvpr2020_manet_tpu.config import Config
from cvpr2020_manet_tpu.interactive.scribbles import (
    annotated_frames, scribbles2mask)
from cvpr2020_manet_tpu.models.layers import resize_bilinear
from cvpr2020_manet_tpu.models.manet import MANet

# Shared download pool (threads created lazily on first submit). One
# process-wide pool instead of one per Evaluator/BatchPropagator instance:
# instances are cheap to create (tests, per-config sweeps) and would each
# leak 4 never-shutdown threads. 4 workers: enough to multiplex the
# tunnel's fixed per-fetch RTT without oversubscribing the link.
_FETCH_POOL = concurrent.futures.ThreadPoolExecutor(
    max_workers=4, thread_name_prefix="mask-fetch")

# ImageNet mean as raw bytes: the uint8 ingest path pads with this so that
# after device-side normalization the padding is ≈0.0 — the same mean-gray
# the host-normalized float path gets from zero padding.
_MEAN_U8 = np.round(np.array([0.485, 0.456, 0.406]) * 255).astype(np.uint8)


def pad_image_to(x: np.ndarray, multiple: int) -> np.ndarray:
    """Pad trailing spatial edges of (..., H, W, C) to a stride multiple."""
    h, w = x.shape[-3], x.shape[-2]
    ph = (-h) % multiple
    pw = (-w) % multiple
    if ph == 0 and pw == 0:
        return x
    pad = [(0, 0)] * (x.ndim - 3) + [(0, ph), (0, pw), (0, 0)]
    return np.pad(x, pad)


def pack_labels(lab, bits: int):
    """Bit-pack uint8 labels along the trailing (W) axis (device-side;
    jnp or numpy): 8 px/byte at 1 bit, 4 at 2 bits, 2 at 4 bits.

    W-axis slicing over the 3-D (T, H, W) map is the FAST layout on TPU:
    a flattened (T, H*W) variant — including a denser base-3 code for the
    3-label case — measured 93.3 -> 81-87 fps at 480p because the pack
    runs at the end of each sweep segment, directly delaying mask
    availability (docs/BENCHMARKS.md)."""
    if bits == 1:
        acc = lab[..., 0::8]
        for i in range(1, 8):
            acc = acc | (lab[..., i::8] << i)
        return acc
    if bits == 2:
        return (lab[..., 0::4] | (lab[..., 1::4] << 2)
                | (lab[..., 2::4] << 4) | (lab[..., 3::4] << 6))
    if bits == 4:
        return lab[..., 0::2] | (lab[..., 1::2] << 4)
    return lab


def mask_bits_for_labels(num_labels: int) -> int:
    """Bits/px for the LIVE label count of a sequence (not the padded
    object bucket): a 1-object sequence ships 1 bit/px — half the bytes
    of the bucket's 2-bit code on the most common DAVIS case."""
    if num_labels <= 2:
        return 1
    if num_labels <= 4:
        return 2
    if num_labels <= 16:
        return 4
    return 8


def aligned_mask_bits(num_labels: int, w_pad: int) -> int:
    """mask_bits_for_labels widened until the packed W axis is
    whole-byte aligned (the strided pack slices need
    W % (8/bits) == 0; e.g. width 848 at mask_stride 4 cannot take the
    1-bit code). Shared by the evaluator round and StreamingIVOS."""
    bits = mask_bits_for_labels(num_labels)
    while w_pad % (8 // bits):
        bits *= 2
    return bits


def object_bucket_for(num_objects: int | None, o_max: int) -> int:
    """Padded object-axis size for a sequence. Small buckets save
    ~linear head/matching time (most DAVIS sequences have <= 3 objects);
    one compilation is cached per bucket. Shared by Evaluator and
    StreamingIVOS so their compile caches and shapes cannot drift."""
    if num_objects is None:
        return o_max
    for b in sorted({min(4, o_max), o_max}):
        if num_objects + 1 <= b:
            return b
    return o_max


def live_page_bucket(rounds: int, capacity: int) -> int:
    """Pages of stacked matching memory to actually match: the filled
    count rounded up to a power of 2, capped at capacity — one cached
    compile per bucket (log2(capacity)+1 graphs), shared by the
    interactive evaluator and the streaming server."""
    r = max(1, min(rounds, capacity))
    p = 1
    while p < r:
        p *= 2
    return min(p, capacity)


def unpack_labels(packed: np.ndarray, bits: int) -> np.ndarray:
    """Inverse of the device-side W-axis bit packing in `_masks_impl`:
    (..., W // ppb) uint8 -> (..., W) uint8, ppb = 8 // bits.

    Strided in-place field writes (no stack/reshape copy) — the unpack
    sits on the interactive round's critical path."""
    if bits == 8:
        return packed
    n = 8 // bits
    mask = (1 << bits) - 1
    out = np.empty((*packed.shape[:-1], packed.shape[-1] * n), np.uint8)
    for i in range(n):
        np.bitwise_and(packed >> (bits * i) if i else packed, mask,
                       out=out[..., i::n])
    return out


def downsample_mask_max(m: np.ndarray, stride: int) -> np.ndarray:
    """(H, W, O) -> (H/s, W/s, O) presence max-pool — thin scribble lines
    survive downsampling to feature resolution."""
    h, w, o = m.shape
    return m.reshape(h // stride, stride, w // stride, stride, o).max((1, 3))


@dataclasses.dataclass
class RoundHandle:
    """Un-fetched device outputs of one dispatched round.

    `Evaluator.dispatch_round` returns one; `collect_round` downloads and
    assembles the label maps. Splitting the two lets callers chain
    dispatch-only rounds — the benchmark's link-independent device-path
    measurement (bench.py), and profiling — without paying the
    device->host mask transfer per round."""
    pk: int                 # mask bits/px
    annot: int              # annotated frame index
    nf: int                 # actual (unpadded) frame count
    t_bucket: int
    masks: Any = None       # monolithic: (T, H, W*pk/8) packed, device
    annot_mask: Any = None  # segmented: (1, H, W*pk/8) packed, device
    seg_masks: list | None = None   # segmented: [(start, count, device)]

    def probe(self) -> np.ndarray:
        """Fetch ONE element of the round's last mask buffer — forces
        completion of every dispatch in the round at ~zero transfer cost
        (the tunneled backend's block_until_ready does not sync)."""
        mk = self.masks if self.masks is not None else self.seg_masks[-1][2]
        return np.asarray(mk[0, 0, :1])


@dataclasses.dataclass
class SequenceState:
    """Per-sequence device-resident state, persists across rounds."""
    feat: jax.Array        # (T, h, w, Cd)
    emb: jax.Array         # (T, h, w, Ce)
    prev_masks: jax.Array  # (T, h, w, O) probabilities
    gmap_mem: jax.Array    # (T, h, w, O) running-min global maps
    int_mem: jax.Array     # (O, h, w, Cma)
    round_idx: int
    num_frames: int        # actual (unpadded) frame count
    # stacked matching-memory mode only (BASELINE config 3: attention over
    # all stored rounds): annotated pixels of every round so far
    mem_emb: jax.Array | None = None      # (R_max * h * w, Ce)
    mem_onehot: jax.Array | None = None   # (R_max * h * w, O)


def release_state(state: SequenceState, keep_features: bool = False) -> None:
    """Free a sequence state's HBM buffers NOW (not at GC time).

    A 104-frame 480p sequence holds ~1.4 GB of cached features alone;
    `run_session` releases each item's state as the session moves on —
    keeping every (sequence, set)'s state alive exhausted the chip's HBM
    a third of the way through a DAVIS-val-scale session.
    `keep_features` preserves feat/emb for reuse by the same sequence's
    next scribble set (extract-once-per-video, SURVEY.md §1)."""
    arrays = [state.prev_masks, state.gmap_mem, state.int_mem,
              state.mem_emb, state.mem_onehot]
    if not keep_features:
        arrays += [state.feat, state.emb]
    for a in arrays:
        if a is not None and hasattr(a, "delete") and not a.is_deleted():
            a.delete()


class Evaluator:
    """Runs a model against an `InteractiveSession`."""

    def __init__(self, cfg: Config, model: MANet, variables,
                 ablate_memory: bool = False, cp_mesh=None):
        self.cfg = cfg
        self.model = model
        self.variables = variables
        self.o = cfg.model.max_objects + 1
        self.stride = cfg.model.feature_stride
        # Ablation switch (tests/quality studies): disable MANet's
        # cross-round memories — global-map min-fusion (C8) and the MA
        # gate (C7) — so every round conditions only on its own scribbles
        # (+ the previous round's masks, which any interactive method
        # carries). Quantifies the memory-aggregation contribution.
        self.ablate_memory = ablate_memory
        backend = model.matching_backend
        if backend == "auto":
            backend = "pallas" if jax.default_backend() == "tpu" else "jnp"
        # Pallas path: bucket the reference pixels ONCE per round
        # (ops/matching_pallas.prepare_ref), stream the kernel per frame.
        # "pallas_interpret" runs the same code path through the Pallas
        # interpreter (CPU-runnable parity tests of the production branch).
        # "pallas_int8" quantizes the global-matching cross term to int8
        # (opt-in serving mode; measured 1.28x kernel / ~+8% device-path
        # projection — docs/BENCHMARKS.md round-5 int8 section, quality
        # cost in docs/QUALITY.md); "pallas_int8_interpret" is its
        # CPU-runnable parity variant.
        self.use_pallas = backend.startswith("pallas")
        self._interpret = backend.endswith("_interpret")
        self._int8 = "int8" in backend
        # "min_fused" (MANet semantics: per-frame elementwise-min memory,
        # SURVEY.md C8) or "stacked" (literal attention over ALL stored
        # rounds' annotated pixels — BASELINE config 3/5).
        self.memory_mode = cfg.eval.matching_memory
        # Context-parallel eval (SURVEY.md §3.3 SP/CP): when a mesh with a
        # 'context' axis is given, the matching-memory rows shard over it
        # and each device matches its shard (on the selected backend — the
        # production Pallas kernel on TPU), combined with an
        # all-gather-min over ICI (parallel/cp_matching.py). Pairs with
        # matching_memory="stacked", where memory rows grow with rounds.
        self.cp_mesh = cp_mesh
        if self._int8 and cp_mesh is not None:
            # cp_matching has no int8 fold; a programmatic Evaluator must
            # hit the same wall the eval_davis CLI guard enforces, not
            # silently run f32 context-parallel matching.
            raise ValueError(
                "matching_backend 'pallas_int8' does not compose with "
                "context-parallel eval (cp_mesh); use the f32 backend")
        from cvpr2020_manet_tpu.parallel.cp_matching import cp_backend
        self._cp_backend = cp_backend(self.use_pallas, self._interpret)
        self._extract = jax.jit(self._extract_impl)
        # masks fused into the round: ONE device dispatch per interaction
        # round (each dispatch pays a full RTT through the TPU tunnel)
        self._round = jax.jit(self._round_impl,
                              static_argnames=("mask_hw", "pack",
                                               "live_rows"))
        # segmented round (cfg.eval.round_segments > 1): interaction
        # dispatch + S sweep dispatches; each segment's packed-mask
        # download overlaps the next segment's compute on the device
        self._start = jax.jit(self._start_impl,
                              static_argnames=("mask_hw", "pack",
                                               "live_rows"))
        self._sweep = jax.jit(self._sweep_impl,
                              static_argnames=("start", "count", "mask_hw",
                                               "pack"))
        self._fetch_pool = _FETCH_POOL
        self.round_latencies: list[float] = []
        # (frame_bucket, object_bucket, seconds) per round — lets callers
        # report per-bucket latency (DAVIS val spans the 32/64/104 frame
        # buckets; a global p50 hides the long-sequence cost)
        self.round_records: list[tuple[int, int, float]] = []

    # ---------------- matching backend ops ----------------------------- #

    def _prepare_ref(self, ref_emb, ref_onehot):
        """Bucket the round's reference pixels for the selected Pallas
        backend (f32 or int8-quantized)."""
        from cvpr2020_manet_tpu.ops.matching_pallas import (
            prepare_ref, prepare_ref_int8)
        fn = prepare_ref_int8 if self._int8 else prepare_ref
        return fn(ref_emb, ref_onehot)

    def _match_prepared(self, query_flat, bucketed):
        """Stream the matching kernel of the selected Pallas backend."""
        from cvpr2020_manet_tpu.ops.matching_pallas import (
            global_matching_prepared, global_matching_prepared_int8)
        fn = (global_matching_prepared_int8 if self._int8
              else global_matching_prepared)
        return fn(query_flat, bucketed, interpret=self._interpret)

    # ---------------- jitted graphs ----------------------------------- #

    def _extract_impl(self, images):
        if images.dtype == jnp.uint8:
            # raw-byte ingest: normalization happens on device (4x less
            # tunnel upload than host-normalized float32 frames); jit
            # specializes per input dtype, so the float path is untouched
            from cvpr2020_manet_tpu.engine.propagate_batch import (
                preprocess_frames)
            images = preprocess_frames(images)
        return self.model.apply(self.variables, images,
                                method=self.model.extract_features)

    def _interaction(self, feat, emb, raster, annot_idx, prev_masks,
                     gmap_mem, int_mem, is_first, obj_valid):
        """Shared round head: device-side scribble pooling, interaction
        branch, MA update, matching-reference labels. Returns
        (int_probs, int_mem, gmap_mem, ref_emb, ref_onehot)."""
        model, variables = self.model, self.variables
        h, w = feat.shape[1:3]
        o = prev_masks.shape[-1]
        neg_inf = -1e9

        # scribble raster (H_pad, W_pad) int8, -1 = unscribbled — one-hot
        # + presence max-pool to feature stride happen ON DEVICE (the
        # raster upload is 16x smaller than per-object pos/neg maps and the
        # host-side numpy pooling was ~77 ms of the round; int8 instead of
        # int32 saves another ~30 ms of tunnel time per round)
        s = self.stride
        raster = raster.astype(jnp.int32)
        scr = (raster >= 0).astype(jnp.float32)[..., None]
        oh = jax.nn.one_hot(jnp.clip(raster, 0, o - 1), o,
                            dtype=jnp.float32) * scr
        blockmax = lambda x: x.reshape(h, s, w, s, o).max(axis=(1, 3))
        pos_scr = blockmax(oh)
        neg_scr = blockmax(scr - oh)

        f_a = feat[annot_idx]
        prev_a = prev_masks[annot_idx]
        int_feats, int_logits = model.apply(
            variables, f_a, pos_scr, neg_scr, prev_a, method=model.interact)
        if self.ablate_memory:
            is_first = jnp.asarray(True)     # re-seed: no MA fusion (C7)
            gmap_mem = jnp.ones_like(gmap_mem)   # no min-fusion (C8)
        elif self.cfg.eval.gmap_refresh > 0.0:
            # leaky min-fusion (config.EvalConfig.gmap_refresh): stored
            # minima relax toward 1.0 once per round, bounding how long a
            # stale match can dominate
            r = self.cfg.eval.gmap_refresh
            gmap_mem = 1.0 - (1.0 - gmap_mem) * (1.0 - r)
        int_mem = model.apply(variables, int_feats, int_mem, is_first,
                              method=model.aggregate_memory)
        int_logits = int_logits + (1.0 - obj_valid)[None, None, :] * neg_inf
        int_probs = jax.nn.softmax(int_logits, axis=-1)

        # Matching reference labels: interaction-branch argmax, overridden
        # by the scribbles themselves (scribbled pixels are ground truth).
        lab = jnp.argmax(int_probs, axis=-1)
        scribbled = jnp.max(pos_scr, axis=-1) > 0
        scr_id = jnp.argmax(pos_scr, axis=-1)
        lab = jnp.where(scribbled, scr_id, lab)
        ref_onehot = jax.nn.one_hot(lab.reshape(-1), o, dtype=jnp.float32)
        ref_onehot = ref_onehot * obj_valid[None, :]
        ref_emb = emb[annot_idx].reshape(-1, emb.shape[-1])
        return int_probs, int_mem, gmap_mem, ref_emb, ref_onehot

    def _round_impl(self, feat, emb, raster, annot_idx,
                    prev_masks, gmap_mem, int_mem, is_first, obj_valid,
                    frame_valid, round_idx=None, mem_emb=None,
                    mem_onehot=None, *, mask_hw=None, pack=8,
                    live_rows=None):
        model, variables = self.model, self.variables
        t, h, w, _ = feat.shape
        o = prev_masks.shape[-1]     # object bucket of this sequence

        int_probs, int_mem, gmap_mem, ref_emb, ref_onehot = \
            self._interaction(feat, emb, raster, annot_idx, prev_masks,
                              gmap_mem, int_mem, is_first, obj_valid)

        if self.memory_mode == "stacked":
            # append this round's annotated pixels to the round memory and
            # match against EVERY stored round (rows of future rounds have
            # all-zero onehot and are gated out of the min)
            nq = ref_emb.shape[0]
            off = round_idx * nq
            mem_emb = jax.lax.dynamic_update_slice(
                mem_emb, ref_emb.astype(mem_emb.dtype), (off, 0))
            mem_onehot = jax.lax.dynamic_update_slice(
                mem_onehot, ref_onehot, (off, 0))
            ref_emb, ref_onehot = mem_emb, mem_onehot
            if live_rows is not None:
                # match only the LIVE round slots (filled in round order;
                # later slots are zero-onehot anyway) — matching FLOPs and
                # bucketing sort scale with rounds held, not capacity
                ref_emb = jax.lax.slice_in_dim(ref_emb, 0, live_rows)
                ref_onehot = jax.lax.slice_in_dim(ref_onehot, 0, live_rows)

        # BOTH sweeps as ONE (T-1)-step scan: the step index maps to the
        # frame visit order [annot+1 .. T-1, annot-1 .. 0], the carry
        # resets to the interaction output where the backward sweep
        # starts, and every frame is matched exactly once (no wasted
        # wrap-around work, half the compute of two full-length sweeps).
        idx = jnp.arange(t - 1)
        fwd_len = t - 1 - annot_idx
        frame = jnp.where(idx < fwd_len,
                          annot_idx + 1 + idx,
                          annot_idx - 1 - (idx - fwd_len))
        prev_frame = jnp.where(idx < fwd_len, frame - 1, frame + 1)
        reset = idx == fwd_len
        emb_ordered = jnp.take(emb, frame, axis=0)

        gm_pre = None
        if self.cp_mesh is not None:
            # context-parallel matching: memory rows sharded over the
            # 'context' mesh axis, per-shard matching on self._cp_backend,
            # all-gather-min combine (parallel/cp_matching.py)
            from cvpr2020_manet_tpu.parallel.cp_matching import cp_match_flat
            ce = emb.shape[-1]
            gm_pre = cp_match_flat(
                emb_ordered.reshape(-1, ce), ref_emb, ref_onehot,
                self.cp_mesh, self._cp_backend).reshape(t - 1, h, w, o)
        elif self.use_pallas:
            # global matching is carry-independent: ALL frames go through
            # the Pallas kernel in ONE batched call (better pipelining
            # than t-1 small launches inside the scan)
            bucketed = self._prepare_ref(ref_emb, ref_onehot)
            ce = emb.shape[-1]
            gm_pre = self._match_prepared(
                emb_ordered.reshape(-1, ce), bucketed
            ).reshape(t - 1, h, w, o)

        # decomposed head stage 1 (models/manet.py): round-constant conv0
        # contributions, computed once per round
        head_fp = model.apply(variables, feat,
                              method=model.head_feat_contrib)
        head_mp = model.apply(variables, int_mem,
                              method=model.head_mem_contrib)

        def step(carry, xs):
            f_t, e_t, e_prev, g_t, g_pre_t, reset, fp_t = xs
            # the backward sweep starts mid-scan: reset the carry to the
            # interaction-branch output at its first step
            prev = jnp.where(reset, int_probs, carry)
            logits, g_new = model.apply(
                variables, f_t, e_t, ref_emb, ref_onehot, None,
                g_t, e_prev, prev, int_mem, obj_valid,
                method=model.propagate, gmap_override=g_pre_t,
                head_pre=fp_t[None] + head_mp)
            probs = jax.nn.softmax(logits, axis=-1)
            return probs, (probs, g_new)

        xs = (jnp.take(feat, frame, axis=0),
              emb_ordered,
              jnp.take(emb, prev_frame, axis=0),
              jnp.take(gmap_mem, frame, axis=0),
              gm_pre,
              reset,
              jnp.take(head_fp, frame, axis=0))
        if gm_pre is None:
            # jnp backend: matching happens inside propagate per step
            step_fn = lambda c, x: step(
                c, (x[0], x[1], x[2], x[3], None, x[4], x[5]))
            xs = (xs[0], xs[1], xs[2], xs[3], xs[5], xs[6])
            _, (probs_seq, g_seq) = jax.lax.scan(step_fn, int_probs, xs)
        else:
            _, (probs_seq, g_seq) = jax.lax.scan(step, int_probs, xs)

        # scatter the visit-ordered outputs back to frame order; the
        # annotated frame keeps the interaction-branch result
        probs = prev_masks.at[frame].set(probs_seq)
        probs = probs.at[annot_idx].set(int_probs)
        gmap = gmap_mem.at[frame].set(g_seq)
        fv = frame_valid[:, None, None, None]
        probs = jnp.where(fv, probs, prev_masks)
        gmap = jnp.where(fv, gmap, gmap_mem)
        masks = (self._masks_impl(probs, hw=mask_hw, pack=pack)
                 if mask_hw else None)
        if self.memory_mode == "stacked":
            return probs, gmap, int_mem, masks, mem_emb, mem_onehot
        return probs, gmap, int_mem, masks

    # -------- segmented round (download/compute pipelining) ------------ #

    def _start_impl(self, feat, emb, raster, annot_idx, prev_masks,
                    gmap_mem, int_mem, is_first, obj_valid,
                    round_idx=None, mem_emb=None, mem_onehot=None,
                    *, mask_hw, pack, live_rows=None):
        """Round head as its own dispatch: interaction branch + matching
        reference prep + the annotated frame's packed mask."""
        int_probs, int_mem, gmap_mem, ref_emb, ref_onehot = \
            self._interaction(feat, emb, raster, annot_idx, prev_masks,
                              gmap_mem, int_mem, is_first, obj_valid)
        o = prev_masks.shape[-1]
        if self.memory_mode == "stacked":
            nq = ref_emb.shape[0]
            off = round_idx * nq
            mem_emb = jax.lax.dynamic_update_slice(
                mem_emb, ref_emb.astype(mem_emb.dtype), (off, 0))
            mem_onehot = jax.lax.dynamic_update_slice(
                mem_onehot, ref_onehot, (off, 0))
            ref_emb, ref_onehot = mem_emb, mem_onehot
            if live_rows is not None:
                ref_emb = jax.lax.slice_in_dim(ref_emb, 0, live_rows)
                ref_onehot = jax.lax.slice_in_dim(ref_onehot, 0, live_rows)
        model, variables = self.model, self.variables
        out = {
            "int_probs": int_probs,
            "int_mem": int_mem,
            "gmap_mem": gmap_mem,
            "ref_emb": ref_emb,
            "ref_onehot": ref_onehot,
            "prev_masks": prev_masks.at[annot_idx].set(int_probs),
            "annot_mask": self._masks_impl(int_probs[None], hw=mask_hw,
                                           pack=pack),
            # decomposed head stage 1 (models/manet.py): the feature and
            # MA-memory conv0 contributions are round-constant — compute
            # once here, reuse for every propagated frame. The feature
            # part is even SEQUENCE-constant, but caching it in
            # SequenceState would cost a feat-sized HBM buffer (~0.7 GB
            # bf16 at the 104-frame bucket) to save a ~2-4 ms conv that
            # runs under the mask transfers — recompute per round instead
            "head_pre_frames": model.apply(
                variables, feat, method=model.head_feat_contrib),
            "head_mem_pre": model.apply(
                variables, int_mem, method=model.head_mem_contrib),
        }
        if self.use_pallas and self.cp_mesh is None:
            # CP mode does not pre-bucket: each shard buckets its own rows
            # inside global_matching_pallas per sweep call
            out["bucketed"] = self._prepare_ref(ref_emb, ref_onehot)
        if self.memory_mode == "stacked":
            out["mem_emb"], out["mem_onehot"] = mem_emb, mem_onehot
        return out

    def _sweep_impl(self, feat, emb, ref_emb, ref_onehot, bucketed,
                    int_probs, carry, prev_masks, gmap_mem, int_mem,
                    annot_idx, obj_valid, frame_valid,
                    head_pre_frames, head_mem_pre,
                    *, start, count, mask_hw, pack):
        """Propagate visit-order steps [start, start+count) of the round's
        (T-1)-step sweep schedule and pack this segment's masks. The carry
        chains across segments; the backward-sweep reset (carry back to the
        interaction output) is per-step, so any segmentation of the
        schedule computes exactly the monolithic round's masks."""
        model, variables = self.model, self.variables
        t, h, w, _ = feat.shape
        o = prev_masks.shape[-1]

        idx = start + jnp.arange(count)
        fwd_len = t - 1 - annot_idx
        frame = jnp.where(idx < fwd_len,
                          annot_idx + 1 + idx,
                          annot_idx - 1 - (idx - fwd_len))
        prev_frame = jnp.where(idx < fwd_len, frame - 1, frame + 1)
        reset = idx == fwd_len
        emb_ordered = jnp.take(emb, frame, axis=0)
        g_taken = jnp.take(gmap_mem, frame, axis=0)

        gm_pre = None
        if self.cp_mesh is not None:
            from cvpr2020_manet_tpu.parallel.cp_matching import cp_match_flat
            ce = emb.shape[-1]
            gm_pre = cp_match_flat(
                emb_ordered.reshape(-1, ce), ref_emb, ref_onehot,
                self.cp_mesh, self._cp_backend).reshape(count, h, w, o)
        elif self.use_pallas:
            ce = emb.shape[-1]
            gm_pre = self._match_prepared(
                emb_ordered.reshape(-1, ce), bucketed
            ).reshape(count, h, w, o)

        def step(c, xs):
            f_t, e_t, e_prev, g_t, g_pre_t, rs, fp_t = xs
            prev = jnp.where(rs, int_probs, c)
            logits, g_new = model.apply(
                variables, f_t, e_t, ref_emb, ref_onehot, None,
                g_t, e_prev, prev, int_mem, obj_valid,
                method=model.propagate, gmap_override=g_pre_t,
                head_pre=fp_t[None] + head_mem_pre)
            probs = jax.nn.softmax(logits, axis=-1)
            return probs, (probs, g_new)

        fp = jnp.take(head_pre_frames, frame, axis=0)
        xs = (jnp.take(feat, frame, axis=0), emb_ordered,
              jnp.take(emb, prev_frame, axis=0), g_taken, gm_pre, reset, fp)
        if gm_pre is None:
            step_fn = lambda c, x: step(c, (x[0], x[1], x[2], x[3], None,
                                            x[4], x[5]))
            xs = (xs[0], xs[1], xs[2], xs[3], xs[5], xs[6])
            carry, (probs_seq, g_seq) = jax.lax.scan(step_fn, carry, xs)
        else:
            carry, (probs_seq, g_seq) = jax.lax.scan(step, carry, xs)

        fv = frame_valid[frame][:, None, None, None]
        probs_w = jnp.where(fv, probs_seq, jnp.take(prev_masks, frame, 0))
        g_w = jnp.where(fv, g_seq, g_taken)
        prev_masks = prev_masks.at[frame].set(probs_w)
        gmap_mem = gmap_mem.at[frame].set(g_w)
        masks = self._masks_impl(probs_w, hw=mask_hw, pack=pack)
        return carry, prev_masks, gmap_mem, masks

    def _segment_spans(self, t: int) -> list[tuple[int, int]]:
        """Split the (t-1)-step sweep schedule into round_segments spans.

        Spans grow geometrically (~2x): the device->host link is the round
        bottleneck and the first segment's masks can only start crossing it
        after that segment computes — a small first segment gets bytes
        flowing early, and later (larger) segments compute under the
        earlier segments' transfers."""
        n = t - 1
        s = max(1, min(self.cfg.eval.round_segments, n))
        # cumulative rounding against the ideal geometric split keeps the
        # LAST span the largest even when the series doesn't divide n (the
        # old per-span cap could collapse the final span to 1 step, putting
        # the smallest dispatch where the most overlap budget is)
        total = (1 << s) - 1
        spans, pos, cum = [], 0, 0
        for i in range(s):
            cum += 1 << i
            end = n if i == s - 1 else min(
                max(round(n * cum / total), pos + 1),  # >=1 per span
                n - (s - 1 - i))                       # leave >=1 per rest
            spans.append((pos, end - pos))
            pos = end
        return spans

    def _masks_impl(self, probs, *, hw, pack):
        """(T, h, w, O) -> (T, H, W * pack / 8) BIT-PACKED argmax labels.

        One batched upsample (fast integer-factor path) + argmax, then
        the uint8 label map is packed along W at `pack` bits/px —
        selected from the sequence's LIVE label count
        (mask_bits_for_labels: 8 px/byte for 1 object, 4 px/byte up to
        3). The device->host transfer rides a ~10 MB/s tunnel and is the
        round's dominant cost. Host side inverts with `unpack_labels`."""
        up = resize_bilinear(probs, hw)
        lab = jnp.argmax(up, axis=-1).astype(jnp.uint8)
        return pack_labels(lab, pack)

    @staticmethod
    def _mask_bits(o_bucket: int) -> int:
        """Bits per pixel in the packed mask transfer for an object bucket."""
        if o_bucket <= 4:
            return 2
        if o_bucket <= 16:
            return 4
        return 8

    # ---------------- host orchestration ------------------------------- #

    def object_bucket(self, num_objects: int | None) -> int:
        return object_bucket_for(num_objects, self.o)

    def frame_bucket(self, num_frames: int) -> int:
        """Padded frame-axis size for a sequence: the smallest enabled
        bucket that fits. Short sequences stop paying the full
        max_frames-step round scan (a 35-frame DAVIS sequence in the
        64-bucket does ~40% of the 104-bucket's matching/decoder work);
        one round compilation is cached per (frame bucket, object bucket)."""
        cfg = self.cfg
        for b in sorted(set(cfg.eval.frame_buckets) | {cfg.eval.max_frames}):
            if num_frames <= b <= cfg.eval.max_frames:
                return b
        raise ValueError(
            f"sequence has {num_frames} frames > eval.max_frames="
            f"{cfg.eval.max_frames}; raise --max_frames (and ensure a "
            f"frame bucket covers it)")

    def start_sequence(self, images: np.ndarray,
                       num_objects: int | None = None) -> SequenceState:
        """Extract + cache features for all frames (the once-per-video
        cost), init memories."""
        cfg = self.cfg
        t_actual = images.shape[0]
        t_pad = self.frame_bucket(t_actual)
        # uint8 frames upload raw and normalize ON DEVICE inside _extract
        # (4x less tunnel traffic); float input keeps the original
        # host-normalized contract. Padding must be the MEAN pixel in both
        # modes (float pads 0.0 = mean in normalized space; raw 0 would be
        # black ≈ -2.1σ and bleed into edge features through the conv
        # receptive field).
        dt = np.uint8 if images.dtype == np.uint8 else np.float32
        h0, w0 = images.shape[1:3]
        images = pad_image_to(images.astype(dt, copy=False), cfg.eval.pad_to)
        if dt == np.uint8 and images.shape[1:3] != (h0, w0):
            images[:, h0:] = _MEAN_U8
            images[:, :, w0:] = _MEAN_U8
        if t_actual < t_pad:
            fill = _MEAN_U8 if dt == np.uint8 else 0
            images = np.concatenate(
                [images, np.full((t_pad - t_actual, *images.shape[1:]),
                                 fill, dt)])
        # Extract in fixed-size chunks: ONE encoder compilation (chunk
        # batch) serves any sequence length, and the compiled graph stays
        # small for the slow remote-compile service.
        chunk = min(8, t_pad)
        assert t_pad % chunk == 0, (t_pad, chunk)
        feats, embs = [], []
        for i in range(0, t_pad, chunk):
            f, e = self._extract(jnp.asarray(images[i:i + chunk]))
            feats.append(f)
            embs.append(e)
        feat = jnp.concatenate(feats, axis=0)
        emb = jnp.concatenate(embs, axis=0)
        return self._init_state(feat, emb, t_actual, num_objects)

    def _init_state(self, feat: jax.Array, emb: jax.Array, t_actual: int,
                    num_objects: int | None) -> SequenceState:
        """Fresh round state around (already-extracted) sequence features."""
        o = self.object_bucket(num_objects)
        t, h, w = feat.shape[0], feat.shape[1], feat.shape[2]
        prev = jnp.zeros((t, h, w, o), jnp.float32).at[..., 0].set(1.0)
        mem_emb = mem_onehot = None
        if self.memory_mode == "stacked":
            m = self.cfg.eval.max_interactions * h * w
            mem_emb = jnp.zeros((m, emb.shape[-1]), emb.dtype)
            mem_onehot = jnp.zeros((m, o), jnp.float32)
        return SequenceState(
            feat=feat, emb=emb, prev_masks=prev,
            gmap_mem=jnp.ones((t, h, w, o), jnp.float32),
            int_mem=jnp.zeros((o, h, w, self.cfg.model.ma_channels),
                              jnp.float32),
            round_idx=0, num_frames=t_actual,
            mem_emb=mem_emb, mem_onehot=mem_onehot)

    def reset_rounds(self, state: SequenceState,
                     num_objects: int | None = None) -> SequenceState:
        """New-item state REUSING the sequence's cached features: the
        encoder runs once per video and serves every scribble set
        (SURVEY.md §1 — the reference's central efficiency claim).
        Releases the old state's round buffers; feat/emb carry over."""
        release_state(state, keep_features=True)
        return self._init_state(state.feat, state.emb, state.num_frames,
                                num_objects)

    def run_round(self, state: SequenceState, scribbles_json: Dict[str, Any],
                  image_hw: tuple[int, int], num_objects: int) -> np.ndarray:
        """One interaction round. Returns (T_actual, H, W) label maps."""
        cfg = self.cfg
        t0 = time.perf_counter()
        af = annotated_frames(scribbles_json)
        annot = af[0] if af else 0
        # rasterize ONLY the annotated frame (full-video rasterization was
        # a 26 MB numpy allocation per round)
        one_frame = {"sequence": scribbles_json["sequence"],
                     "scribbles": [scribbles_json["scribbles"][annot]]}
        raster = scribbles2mask(one_frame, image_hw)[0]
        raster = np.pad(raster,
                        [((0, (-image_hw[0]) % cfg.eval.pad_to)),
                         ((0, (-image_hw[1]) % cfg.eval.pad_to))],
                        constant_values=-1)
        handle = self.dispatch_round(state, raster, annot, num_objects)
        masks = self.collect_round(handle, image_hw)
        dt = time.perf_counter() - t0
        self.round_latencies.append(dt)
        self.round_records.append(
            (handle.t_bucket, state.prev_masks.shape[-1], dt))
        return masks

    def dispatch_round(self, state: SequenceState, raster: np.ndarray,
                       annot: int, num_objects: int) -> RoundHandle:
        """Enqueue one round's device work (interaction branch, sweeps,
        memory updates, packed-mask encode) with NO device->host transfer,
        updating `state`'s device handles in place. `raster` is the
        annotated frame's scribble raster already padded to `pad_to`
        (int8, -1 = unscribbled); it may be a pre-uploaded device array.
        Returns the handle `collect_round` downloads labels from."""
        cfg = self.cfg
        o_bucket = state.prev_masks.shape[-1]
        assert num_objects + 1 <= o_bucket, (num_objects, o_bucket)
        obj_valid = np.zeros((o_bucket,), np.float32)
        obj_valid[:num_objects + 1] = 1.0
        t_bucket = state.feat.shape[0]
        frame_valid = (np.arange(t_bucket) < state.num_frames).astype(bool)

        ms = cfg.eval.mask_stride
        h_pad = raster.shape[0] // ms
        w_pad = raster.shape[1] // ms
        stacked = self.memory_mode == "stacked"
        kw = {}
        live_rows = None
        if stacked:
            # clamp: past max_interactions, overwrite the last slot
            r = min(state.round_idx, self.cfg.eval.max_interactions - 1)
            kw = dict(round_idx=jnp.asarray(r, jnp.int32),
                      mem_emb=state.mem_emb, mem_onehot=state.mem_onehot)
            # live-round slicing: match only the filled slots
            # (live_page_bucket caps the compile count)
            hh, ww = state.feat.shape[1:3]
            live_rows = live_page_bucket(
                r + 1, self.cfg.eval.max_interactions) * hh * ww
        args = (state.feat, state.emb, jnp.asarray(raster, jnp.int8),
                jnp.asarray(annot, jnp.int32), state.prev_masks,
                state.gmap_mem, state.int_mem,
                jnp.asarray(state.round_idx == 0),
                jnp.asarray(obj_valid))

        # densest lossless mask code for the LIVE label count (1 object
        # -> 8 px/byte); one cached compile per (bucket, bit depth).
        # Widen until the packed W axis is whole-byte aligned (the strided
        # pack slices need W % (8/bits) == 0; e.g. width 848 at
        # mask_stride 4 cannot take the 1-bit code).
        pk = aligned_mask_bits(num_objects + 1, w_pad)
        handle = RoundHandle(pk=pk, annot=annot, nf=state.num_frames,
                             t_bucket=t_bucket)
        if cfg.eval.round_segments > 1:
            self._dispatch_segmented(
                state, handle, args, kw, frame_valid, (h_pad, w_pad),
                live_rows)
        else:
            full_args = args[:9] + (jnp.asarray(frame_valid),)
            if stacked:
                probs, gmap, int_mem, masks, mem_emb, mem_onehot = \
                    self._round(*full_args, **kw, mask_hw=(h_pad, w_pad),
                                pack=pk, live_rows=live_rows)
                state.mem_emb, state.mem_onehot = mem_emb, mem_onehot
            else:
                probs, gmap, int_mem, masks = self._round(
                    *full_args, mask_hw=(h_pad, w_pad), pack=pk)
            state.prev_masks, state.gmap_mem = probs, gmap
            state.int_mem = int_mem
            handle.masks = masks
        state.round_idx += 1
        return handle

    def collect_round(self, handle: RoundHandle,
                      image_hw: tuple[int, int]) -> np.ndarray:
        """Download + assemble a dispatched round's (T_actual, H, W)
        label maps."""
        pk = handle.pk
        if handle.masks is not None:
            masks = np.asarray(handle.masks)[:handle.nf]
            masks = unpack_labels(masks, pk)
        else:
            # downloads: issued CONCURRENTLY from a thread pool — the
            # tunnel multiplexes the fetch RPCs, so each fetch's fixed RTT
            # and the byte transfers overlap both each other and the later
            # segments' device compute (device_get releases the GIL)
            fetches = [self._fetch_pool.submit(np.asarray,
                                               handle.annot_mask)]
            fetches += [self._fetch_pool.submit(np.asarray, mk)
                        for _, _, mk in handle.seg_masks]
            lab_annot = unpack_labels(fetches[0].result(), pk)[0]
            nf = handle.nf
            labels = np.zeros((nf, *lab_annot.shape), np.uint8)
            labels[handle.annot] = lab_annot
            fwd_len = handle.t_bucket - 1 - handle.annot
            for (s0, c, _), fut in zip(handle.seg_masks, fetches[1:]):
                lab = unpack_labels(fut.result(), pk)
                for j in range(c):
                    i = s0 + j
                    f = (handle.annot + 1 + i if i < fwd_len
                         else handle.annot - 1 - (i - fwd_len))
                    if 0 <= f < nf:
                        labels[f] = lab[j]
            masks = labels
        ms = self.cfg.eval.mask_stride
        if ms > 1:
            masks = np.repeat(np.repeat(masks, ms, axis=1), ms, axis=2)
        h_img, w_img = image_hw
        return masks[:, :h_img, :w_img].astype(np.int32)

    def _dispatch_segmented(self, state: SequenceState, handle: RoundHandle,
                            args, kw, frame_valid: np.ndarray,
                            mask_hw, live_rows: int | None = None) -> None:
        """Pipelined round: 1 interaction dispatch + S sweep dispatches,
        all enqueued up front (dispatch is async); collect_round then
        drains the packed-mask downloads in order, each overlapping the
        later segments' device compute. Bitwise-identical masks to the
        monolithic round (pinned by tests)."""
        pk = handle.pk
        out = self._start(*args, **kw, mask_hw=mask_hw, pack=pk,
                          live_rows=live_rows)
        if self.memory_mode == "stacked":
            state.mem_emb, state.mem_onehot = out["mem_emb"], out["mem_onehot"]
        t_bucket = state.feat.shape[0]
        carry = out["int_probs"]
        pm, gm, im = out["prev_masks"], out["gmap_mem"], out["int_mem"]
        fv = jnp.asarray(frame_valid)
        annot_j = args[3]
        ov = args[8]
        seg_masks = []
        for s0, c in self._segment_spans(t_bucket):
            carry, pm, gm, mk = self._sweep(
                state.feat, state.emb, out["ref_emb"], out["ref_onehot"],
                out.get("bucketed"), out["int_probs"], carry, pm, gm, im,
                annot_j, ov, fv, out["head_pre_frames"],
                out["head_mem_pre"], start=s0, count=c, mask_hw=mask_hw,
                pack=pk)
            seg_masks.append((s0, c, mk))
        state.prev_masks, state.gmap_mem, state.int_mem = pm, gm, im
        handle.annot_mask = out["annot_mask"]
        handle.seg_masks = seg_masks

    # ---------------- full benchmark ----------------------------------- #

    def run_session(self, session, on_masks=None) -> Dict[str, Any]:
        """Drive an InteractiveSession to completion (SURVEY.md §4.1).

        on_masks(seq, set_idx, round_idx, masks): optional per-submission
        callback (e.g. PNG dumping).
        """
        # ONE live device state: states are released as the session moves
        # on (see release_state — keeping all of DAVIS val's states alive
        # OOMs the chip), and feat/emb are reused across a sequence's
        # scribble sets, so the encoder still runs once per video.
        st: SequenceState | None = None
        st_key = None          # (sequence, set) the live state serves
        st_seq = None          # sequence whose features st holds
        hw = None              # full-res (H, W) of st_seq
        with session as sess:
            while sess.next():
                seq, scribbles, first = sess.get_scribbles(only_last=True)
                key = sess.current
                if key != st_key:
                    if seq == st_seq:
                        # new scribble set, same sequence: fresh round
                        # state over the cached features
                        st = self.reset_rounds(
                            st, sess.dataset.num_objects(seq))
                    else:
                        if st is not None:
                            release_state(st)
                        # Masks are scored at image resolution; the model
                        # loop never touches ground truth (a RemoteSession
                        # dataset view has images/num_objects, no gt).
                        # Raw uint8 frames (when the dataset offers them)
                        # normalize on device — 4x less upload.
                        images_fn = getattr(sess.dataset, "images_uint8",
                                            sess.dataset.images)
                        images = images_fn(seq)
                        hw = images.shape[1:3]
                        st = self.start_sequence(
                            images, sess.dataset.num_objects(seq))
                        st_seq = seq
                    st_key = key
                masks = self.run_round(
                    st, scribbles, hw, sess.dataset.num_objects(seq))
                if on_masks is not None:
                    on_masks(seq, key[1], st.round_idx - 1, masks)
                sess.submit_masks(masks)
        if st is not None:
            release_state(st)
        return session.get_global_summary()
