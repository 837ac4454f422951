"""Batched multi-sequence mask propagation (BASELINE config 4).

Offline propagation at YouTube-VOS scale: given B clips and their
first-frame object masks, propagate every clip's masks through time in ONE
jitted graph — preprocessing (uint8 -> normalize), feature extraction,
frame-0 interaction seeding, and the temporal scan are all device-side;
the host supplies raw frames and receives label maps.

This is the batch-throughput counterpart of the interactive evaluator:
two small jitted graphs (chunked feature extraction; one per-sequence
seed + temporal-scan + pack graph) glued by a host pipeline — sequences
dispatch back-to-back and their packed-mask downloads drain concurrently,
overlapping the later sequences' compute (see BatchPropagator docstring
for why vmap over sequences is not an option).
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
    """Two small jitted graphs + a host pipeline (NOT one monolithic jit):

    - `_extract`: fixed 8-frame encoder chunks — one compilation serves
      any (B, T), and peak backbone activation memory stays bounded.
    - `_one_seq`: seed-from-first-mask + temporal scan + upsample/argmax
      + bit-pack for ONE sequence. Sequences are dispatched back-to-back
      (dispatch is async) and their packed-mask downloads drain
      concurrently from a thread pool, overlapping the later sequences'
      compute — the same pipelining as the interactive evaluator's
      segmented rounds. vmap over sequences is not an option anyway: the
      Pallas matching kernels use manually-DMA'd ANY-memory-space
      operands that Mosaic cannot batch."""

    def __init__(self, cfg: Config, model: MANet, variables,
                 ingest: str = "rgb"):
        if ingest not in ("rgb", "yuv420"):
            raise ValueError(f"unknown ingest format {ingest!r}")
        self.cfg = cfg
        self.model = model
        self.variables = variables
        self.ingest = ingest
        self.o = cfg.model.max_objects + 1
        self._extract = jax.jit(self._extract_impl)
        # o static: sequences run in their own object bucket (one cached
        # compile per bucket — the evaluator's object_bucket policy);
        # a 1-2 object clip pays ~half the head/matching FLOPs of the
        # full max_objects bucket
        self._one_seq = jax.jit(self._one_seq_impl, static_argnames=("o",))
        from cvpr2020_manet_tpu.engine.evaluator import _FETCH_POOL
        self._fetch_pool = _FETCH_POOL
        self._upload_pool = None   # created on first upload(threads>1)

    def _extract_impl(self, frames_u8):
        """(N, H, W, 3) uint8 RGB — or, under ingest='yuv420', a
        (y (N, H, W), uv (N, H/2, W/2, 2)) uint8 pair at HALF the
        transfer bytes — -> (features, embeddings). The colorspace
        inverse is elementwise and fuses into normalize + conv1."""
        if self.ingest == "yuv420":
            from cvpr2020_manet_tpu.utils.ingest import yuv420_to_rgb
            y, uv = frames_u8
            x = yuv420_to_rgb(y, uv) / 255.0
            x = (x - jnp.asarray(IMAGENET_MEAN)) / jnp.asarray(IMAGENET_STD)
        else:
            x = preprocess_frames(frames_u8)
        return self.model.apply(self.variables, x,
                                method=self.model.extract_features)

    def _one_seq_impl(self, feat_s, emb_s, first_mask, ov, *, o):
        """One sequence: (T, hh, ww, *) features/embeddings + first-frame
        labels -> bit-packed argmax label maps (T, H, W * bits / 8).
        `o` is the sequence's padded object bucket (static)."""
        model, variables = self.model, self.variables
        t, hh, ww, _ = feat_s.shape
        s = self.cfg.model.feature_stride
        h_img, w_img = hh * s, ww * s

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
        # decomposed head stage 1 (models/manet.py): per-sequence feature
        # and per-clip memory conv0 contributions hoisted out of the scan
        head_fp = model.apply(variables, feat_s,
                              method=model.head_feat_contrib)
        head_mp = model.apply(variables, int_mem,
                              method=model.head_mem_contrib)

        def step(carry, xs):
            prev_probs, e_prev = carry
            f_t, e_t, fp_t = xs
            logits, _ = model.apply(
                variables, f_t, e_t, ref_emb, ref_oh, None,
                jnp.ones((hh, ww, o), jnp.float32), e_prev, prev_probs,
                int_mem, ov, method=model.propagate,
                head_pre=fp_t[None] + head_mp)
            probs = jax.nn.softmax(logits, axis=-1)
            return (probs, e_t), probs

        init = (first_oh, emb_s[0])
        _, probs_seq = jax.lax.scan(
            step, init, (feat_s[1:], emb_s[1:], head_fp[1:]))
        probs_seq = jnp.concatenate([first_oh[None], probs_seq], axis=0)

        lab = jnp.argmax(resize_bilinear(probs_seq, (h_img, w_img)),
                         axis=-1).astype(jnp.uint8)
        # bit-packed transfer (2/4 bits per pixel): raw label maps are the
        # dominant device->host cost at batch scale
        from cvpr2020_manet_tpu.engine.evaluator import (
            Evaluator, pack_labels)
        bits = Evaluator._mask_bits(o)
        return pack_labels(lab, bits)  # bits follows the bucket `o`

    # -- pipeline pieces (upload / dispatch / drain) --------------------- #
    #
    # propagate() composes them; callers that stream multiple batches can
    # interleave: dispatch batch i, upload batch i+1 (rides under batch
    # i's device compute), drain batch i — see main()'s timed loop.

    def upload(self, frames_u8, threads: int = 1) -> list:
        """Chunked host->device upload, interleaved with encoder DISPATCH
        so each chunk's transfer rides under the previous chunk's encoder
        compute (dispatch is async; the upload is the host-blocking part
        on the sandbox link). Returns per-chunk (feat, emb) futures.

        Input is either raw RGB (N, H, W, 3) uint8, or — under
        ingest='yuv420' — optionally an ALREADY-PACKED (y, uv) pair, the
        production path (video decoders emit planar YUV; converting
        RGB->YUV per chunk on the host costs more than the halved upload
        saves on a single-core host — measured 11.9 vs 14.3 fps at 720p).

        threads > 1 issues the per-chunk `device_put`s CONCURRENTLY from
        a thread pool: the tunnel multiplexes transfer RPCs (measured for
        downloads — the segmented round's concurrent mask fetches), so
        parallel uploads can raise aggregate bandwidth on the
        upload-exposed 720p configuration. Encoder chunks still dispatch
        in order."""
        if isinstance(frames_u8, tuple):
            if self.ingest != "yuv420":
                raise ValueError("packed (y, uv) input needs ingest='yuv420'")
            y, uv = frames_u8
            bt = y.shape[0]
            outs = []
            if threads > 1:
                pool = self._ensure_upload_pool(threads)
                puts = [pool.submit(jax.device_put,
                                    (y[i:i + 8], uv[i:i + 8]))
                        for i in range(0, bt, 8)]
                return [self._extract(f.result()) for f in puts]
            for i in range(0, bt, 8):
                dev = jax.device_put((y[i:i + 8], uv[i:i + 8]))
                outs.append(self._extract(dev))
            return outs
        bt, h_img, w_img, _ = frames_u8.shape
        flat = frames_u8.reshape(bt, h_img, w_img, 3)
        # full 8-frame chunks + at most one remainder chunk: the encoder
        # compile and its peak activation memory stay bounded for EVERY
        # (B, T) product (a non-dividing bt used to fall back to one
        # bt-sized chunk — fresh compile per shape, batch-scaled memory)
        outs = []
        if threads > 1:
            pool = self._ensure_upload_pool(threads)
            puts = [pool.submit(
                        lambda c: jax.device_put(self._host_chunk(c)),
                        flat[i:i + 8])
                    for i in range(0, bt, 8)]
            return [self._extract(f.result()) for f in puts]
        for i in range(0, bt, 8):
            dev = jax.device_put(self._host_chunk(flat[i:i + 8]))
            outs.append(self._extract(dev))   # async dispatch; next
            # iteration's device_put overlaps this chunk's encode
        return outs

    def _ensure_upload_pool(self, threads: int):
        import concurrent.futures
        if self._upload_pool is None or \
                self._upload_pool._max_workers != threads:
            self._upload_pool = concurrent.futures.ThreadPoolExecutor(
                max_workers=threads, thread_name_prefix="frame-upload")
        return self._upload_pool

    def _host_chunk(self, chunk: np.ndarray):
        """Host-side ingest packing of one upload chunk. Under 'yuv420'
        this is the test/compat conversion — production callers feed the
        video decoder's planar output directly (utils/ingest.py)."""
        if self.ingest == "yuv420":
            from cvpr2020_manet_tpu.utils.ingest import rgb_to_yuv420_host
            return rgb_to_yuv420_host(chunk)
        return chunk

    def dispatch(self, extracted: list, first_masks: np.ndarray,
                 num_objects: np.ndarray, batch_shape: tuple):
        """Per-sequence propagation dispatches + concurrent mask fetches.
        Returns (fetch futures, per-sequence bits list)."""
        from cvpr2020_manet_tpu.engine.evaluator import (
            Evaluator, object_bucket_for)
        b, t = batch_shape
        n_obj = [int(n) for n in np.asarray(num_objects)]
        buckets = [object_bucket_for(n, self.o) for n in n_obj]
        bits_list = [Evaluator._mask_bits(ob) for ob in buckets]
        # validate BEFORE issuing device work (and for direct pipeline
        # callers, who previously hit an opaque pack_labels trace error):
        # packed masks need the upsampled width divisible by 8/bits
        w_img = extracted[0][0].shape[2] * self.cfg.model.feature_stride
        for bits in set(bits_list):
            assert w_img % (8 // bits) == 0, \
                f"width {w_img} must be a multiple of {8 // bits} (pad_to)"
        feat = jnp.concatenate([f for f, _ in extracted], axis=0)
        emb = jnp.concatenate([e for _, e in extracted], axis=0)
        hh, ww = feat.shape[1:3]
        feat = feat.reshape(b, t, hh, ww, -1)
        emb = emb.reshape(b, t, hh, ww, -1)
        fm = jnp.asarray(first_masks)
        # dispatch every sequence (async) in ITS OWN object bucket, then
        # drain downloads in order: sequence i's packed masks cross the
        # link while i+1.. compute
        fetches = []
        for i in range(b):
            ob = buckets[i]
            ov_i = np.zeros((ob,), np.float32)
            ov_i[:n_obj[i] + 1] = 1.0
            packed = self._one_seq(feat[i], emb[i], fm[i],
                                   jnp.asarray(ov_i), o=ob)
            fetches.append(self._fetch_pool.submit(np.asarray, packed))
        return fetches, bits_list

    @staticmethod
    def drain(fetches, bits) -> np.ndarray:
        from cvpr2020_manet_tpu.engine.evaluator import unpack_labels
        if isinstance(bits, int):
            bits = [bits] * len(fetches)
        labs = [unpack_labels(f.result(), b) for f, b in zip(fetches, bits)]
        return np.stack(labs).astype(np.int32)

    def propagate(self, frames_u8: np.ndarray, first_masks: np.ndarray,
                  num_objects: np.ndarray) -> np.ndarray:
        """Host API. frames_u8 (B,T,H,W,3) uint8; first_masks (B,h,w) int
        at feature resolution; num_objects (B,)."""
        b, t, h_img, w_img, _ = frames_u8.shape
        extracted = self.upload(frames_u8.reshape(b * t, h_img, w_img, 3))
        # width validation happens in dispatch(), before device work
        fetches, bits = self.dispatch(extracted, first_masks, num_objects,
                                      (b, t))
        return self.drain(fetches, bits)


# --------------------------------------------------------------------- #
# Throughput CLI (BASELINE config 4: YouTube-VOS-scale batched
# propagation). Feeds fixed (B, T, H, W) buckets from a dataset adapter —
# YTVOS / DAVIS trees or the synthetic fixture — through BatchPropagator
# and reports frames/s as one JSON metric line.
#
#   python -m cvpr2020_manet_tpu.engine.propagate_batch \
#       --dataset ytvos --data_root /data/ytvos --batch 4 --frames 16
# --------------------------------------------------------------------- #

def _load_batches(ds, batch: int, frames: int, image_hw, stride: int):
    """Yield (frames_u8 (B,T,H,W,3), first_masks (B,h,w), num_objects (B,))
    from an eval-style adapter, padding short sequences by repeating the
    last frame and slicing long ones."""
    from cvpr2020_manet_tpu.data.davis import IMAGENET_MEAN, IMAGENET_STD
    h_img, w_img = image_hw
    names = ds.sequences()
    # the tail yields a smaller final batch rather than dropping
    # sequences: propagation dispatches per-sequence, so a short batch
    # costs no new compilation
    for i in range(0, len(names), batch):
        fr, fm, no = [], [], []
        for seq in names[i:i + batch]:
            imgs = ds.images(seq)      # normalized float (T, H, W, 3)
            gt = ds.gt_masks(seq)
            u8 = np.clip((imgs * IMAGENET_STD + IMAGENET_MEAN) * 255.0,
                         0, 255).astype(np.uint8)
            t = u8.shape[0]
            if t < frames:
                pad = np.repeat(u8[-1:], frames - t, axis=0)
                u8 = np.concatenate([u8, pad], axis=0)
            u8 = u8[:frames, :h_img, :w_img]
            if u8.shape[1:3] != (h_img, w_img):
                py, px = h_img - u8.shape[1], w_img - u8.shape[2]
                u8 = np.pad(u8, ((0, 0), (0, py), (0, px), (0, 0)))
                gt = np.pad(gt, ((0, 0), (0, py), (0, px)))
            fr.append(u8)
            fm.append(gt[0, :h_img:stride, :w_img:stride])
            no.append(ds.num_objects(seq))
        yield (np.stack(fr), np.stack(fm).astype(np.int32),
               np.asarray(no, np.int32))


def main(argv=None):
    from cvpr2020_manet_tpu.utils.jax_cache import enable_persistent_cache
    enable_persistent_cache()
    import argparse
    import json
    import time

    import jax

    from cvpr2020_manet_tpu.config import Config, tiny_test_config

    p = argparse.ArgumentParser()
    p.add_argument("--dataset", choices=["synthetic", "davis", "ytvos"],
                   default="synthetic")
    p.add_argument("--data_root", default=None)
    p.add_argument("--batch", type=int, default=4)
    p.add_argument("--frames", type=int, default=16)
    p.add_argument("--image_size", type=int, nargs=2, default=None)
    p.add_argument("--checkpoint", default=None,
                   help="orbax release export dir")
    p.add_argument("--timed_batches", type=int, default=4)
    p.add_argument("--upload_threads", type=int, default=1,
                   help="concurrent device_put threads for frame upload "
                        "(multiplexes the transfer link; see upload())")
    p.add_argument("--ingest", choices=["rgb", "yuv420"], default="rgb",
                   help="frame upload format: yuv420 halves the bytes "
                        "(device-side colorspace inverse; utils/ingest.py)")
    p.add_argument("--matching_int8", action="store_true",
                   help="int8-quantized global matching (serving mode; "
                        "measured 1.28x matching-kernel speedup — "
                        "docs/BENCHMARKS.md round-5 int8 section). The "
                        "batch path routes matching through the model's "
                        "backend switch, so the flag is pure plumbing")
    p.add_argument("--tiny", action="store_true")
    args = p.parse_args(argv)

    cfg = tiny_test_config() if args.tiny else Config()
    image_hw = tuple(args.image_size) if args.image_size \
        else cfg.eval.image_size
    h_img = image_hw[0] + (-image_hw[0]) % cfg.eval.pad_to
    w_img = image_hw[1] + (-image_hw[1]) % cfg.eval.pad_to
    s = cfg.model.feature_stride

    if args.dataset == "synthetic":
        from cvpr2020_manet_tpu.data import SyntheticDataset
        ds = SyntheticDataset(
            image_size=(h_img, w_img), num_frames=args.frames,
            num_sequences=args.batch * (args.timed_batches + 1),
            num_objects=2, scribble_sets=1)
    elif args.dataset == "davis":
        from cvpr2020_manet_tpu.data.davis import DavisEvalDataset
        ds = DavisEvalDataset(args.data_root)
    else:
        from cvpr2020_manet_tpu.data.ytvos import YTVOSDataset
        ds = YTVOSDataset(args.data_root)

    from cvpr2020_manet_tpu.models import MANet
    model = MANet(cfg.model, matching_backend=(
        "pallas_int8" if args.matching_int8 else "auto"))
    o = cfg.model.max_objects + 1
    variables = jax.jit(model.init)(
        jax.random.PRNGKey(0), jnp.zeros((1, h_img, w_img, 3)),
        jnp.zeros((1, h_img // s, w_img // s, o)),
        jnp.zeros((1, h_img // s, w_img // s, o)))
    if args.checkpoint:
        from cvpr2020_manet_tpu.utils.checkpoint import load_release
        params = load_release(variables["params"], args.checkpoint)
        variables = {**variables, "params": params}
    prop = BatchPropagator(cfg, model, variables, ingest=args.ingest)

    gen = _load_batches(ds, args.batch, args.frames, (h_img, w_img), s)
    first = next(gen, None)
    if first is None:
        raise SystemExit(f"dataset has no sequences "
                         f"({args.dataset}, root={args.data_root})")
    timed = []
    for fr, fm, no in gen:
        timed.append((fr, fm, no))
        if len(timed) >= args.timed_batches:
            break
    if not timed:
        timed = [first]
    out = prop.propagate(*first)          # compile + warm-up
    out.sum()

    b, t = first[0].shape[:2]
    if args.ingest == "yuv420":
        # pre-convert OUTSIDE the timed loops: production input is the
        # decoder's planar YUV, so the conversion is harness cost (like
        # the synthetic frame generation itself) — converting per chunk
        # inside the pipeline on a single-core host costs more than the
        # halved upload saves (measured 11.9 vs 14.3 fps at 4x16 720p)
        from cvpr2020_manet_tpu.utils.ingest import rgb_to_yuv420_host
        flatten = lambda fr: rgb_to_yuv420_host(
            fr.reshape(b * t, h_img, w_img, 3))
    else:
        flatten = lambda fr: fr.reshape(b * t, h_img, w_img, 3)

    # serial: upload -> compute -> download per batch, no cross-batch
    # overlap (the round-2 baseline measurement)
    times = []
    for fr, fm, no in timed:
        t0 = time.perf_counter()
        prop.propagate(fr, fm, no).sum()
        times.append(time.perf_counter() - t0)

    # device-path probe: inputs pre-uploaded; time dispatch + drain only.
    # This is the compute + mask-download cost — the floor the pipelined
    # loop tries to hit when uploads hide fully.
    ex = prop.upload(flatten(first[0]))
    np.asarray(ex[-1][0][:1, :1, :1, :1])  # sync (uploads + extract done)
    dev_times = []
    for _ in range(2):
        t0 = time.perf_counter()
        fetches, bits = prop.dispatch(ex, first[1], first[2], (b, t))
        prop.drain(fetches, bits)
        dev_times.append(time.perf_counter() - t0)
    t_device = float(np.median(dev_times))

    # pipelined: batch i+1's chunked upload is issued between batch i's
    # dispatch and drain, riding under batch i's device compute.
    # Ingest packing happens BEFORE the clock (see the flatten note).
    uploads = [flatten(fr) for fr, _, _ in timed]
    ex = prop.upload(uploads[0], threads=args.upload_threads)
    t0 = time.perf_counter()
    for i, (fr, fm, no) in enumerate(timed):
        fetches, bits = prop.dispatch(ex, fm, no, (b, t))
        if i + 1 < len(timed):
            ex = prop.upload(uploads[i + 1],
                             threads=args.upload_threads)
        prop.drain(fetches, bits)
    t_pipe = (time.perf_counter() - t0) / len(timed)

    frames_total = args.batch * args.frames
    fps = frames_total / float(np.median(times))
    print(json.dumps({
        "metric": "batched_propagation_fps",
        "value": round(frames_total / t_pipe, 2), "unit": "frames/s",
        "fps_serial": round(fps, 2),
        "batch": args.batch, "frames": args.frames,
        "image_size": [h_img, w_img], "timed_batches": len(timed),
        # fraction of pipelined wall-clock accounted for by the
        # device-path (compute + mask download); 1.0 = uploads fully
        # hidden under compute
        "device_busy_fraction": round(t_device / t_pipe, 3),
    }))
    return 0


if __name__ == "__main__":
    main()
