"""DAVIS dataset adapters (SURVEY.md C12/C13, ref:dataloaders/ expected).

Standard DAVIS-2017 tree:
    DAVIS/
      JPEGImages/480p/<seq>/00000.jpg ...
      Annotations/480p/<seq>/00000.png ...      (palettized label maps)
      ImageSets/2017/{train,val}.txt
      Scribbles/<seq>/001.json ... 003.json     (interactive challenge)

Two adapters:
- `DavisEvalDataset`: the interface `InteractiveSession` consumes
  (sequences / images / gt_masks / num_objects / initial_scribbles).
- `DavisTrainDataset`: stage-1/2 triplet/clip sampler with joint
  augmentation (random scale, crop, horizontal flip — SURVEY.md C14),
  emitting the {'images', 'labels', 'obj_valid'} batches the trainers eat.

Decode is host-side (PIL) with per-sequence LRU caching; normalization and
everything after batch assembly is device-side (BASELINE: fused on-device
preprocessing — the trainers consume raw uint8-scaled floats).
"""

from __future__ import annotations

import functools
import json
import os
from typing import Dict, List

import numpy as np

from cvpr2020_manet_tpu.interactive.scribbles import Scribbles
from cvpr2020_manet_tpu.utils.colormap import load_indexed_png

IMAGENET_MEAN = np.array([0.485, 0.456, 0.406], np.float32)
IMAGENET_STD = np.array([0.229, 0.224, 0.225], np.float32)


def normalize_image(img: np.ndarray) -> np.ndarray:
    """[0,1] float RGB -> ImageNet-normalized (reference transform C14)."""
    return (img - IMAGENET_MEAN) / IMAGENET_STD


class DavisEvalDataset:
    """Interactive-evaluation adapter over a DAVIS tree."""

    def __init__(self, root: str, subset: str = "val", year: str = "2017",
                 resolution: str = "480p", scribble_sets: int = 3):
        self.root = root
        self.resolution = resolution
        self.scribble_sets = scribble_sets
        split = os.path.join(root, "ImageSets", year, f"{subset}.txt")
        with open(split) as f:
            self._names = [ln.strip() for ln in f if ln.strip()]

    def sequences(self) -> List[str]:
        return list(self._names)

    def _frame_files(self, seq: str, kind: str, ext: str) -> List[str]:
        d = os.path.join(self.root, kind, self.resolution, seq)
        return sorted(os.path.join(d, f) for f in os.listdir(d)
                      if f.endswith(ext))

    @functools.lru_cache(maxsize=4)
    def images(self, seq: str) -> np.ndarray:
        from PIL import Image
        files = self._frame_files(seq, "JPEGImages", ".jpg")
        frames = [np.asarray(Image.open(f), np.float32) / 255.0
                  for f in files]
        return normalize_image(np.stack(frames))

    @functools.lru_cache(maxsize=2)
    def images_uint8(self, seq: str) -> np.ndarray:
        """Raw (T, H, W, 3) uint8 frames — the evaluator normalizes ON
        DEVICE (Evaluator._extract_impl), so this path ships 4x fewer
        bytes than `images()` and holds 4x less host RAM per cached
        sequence (a 100-frame 480p stack is ~120 MB vs ~490 MB float)."""
        from PIL import Image
        files = self._frame_files(seq, "JPEGImages", ".jpg")
        return np.stack([np.asarray(Image.open(f), np.uint8)
                         for f in files])

    @functools.lru_cache(maxsize=4)
    def gt_masks(self, seq: str) -> np.ndarray:
        files = self._frame_files(seq, "Annotations", ".png")
        return np.stack([load_indexed_png(f) for f in files])

    def num_objects(self, seq: str) -> int:
        # max over ALL frames: an object absent from frame 0 (possible in
        # non-DAVIS adapters reusing this interface) must still be scored.
        # Memoized in a per-instance dict (ints are tiny; an lru_cache on
        # the method would pin `self` — and its cached frame arrays — for
        # process lifetime): callers hit this per round and the gt_masks
        # LRU only holds 4 sequences — a miss would re-decode every GT
        # PNG of the sequence inside the session's time budget.
        cache = self.__dict__.setdefault("_num_objects_cache", {})
        if seq not in cache:
            cache[seq] = int(self.gt_masks(seq).max())
        return cache[seq]

    def num_scribble_sets(self, seq: str) -> int:
        return self.scribble_sets

    def initial_scribbles(self, seq: str, set_idx: int) -> Scribbles:
        path = os.path.join(self.root, "Scribbles", seq,
                            f"{set_idx + 1:03d}.json")
        with open(path) as f:
            return Scribbles.from_json(json.load(f))


class DavisTrainDataset:
    """Clip sampler with joint augmentation for stage-1/2 training.

    Works over any eval-style adapter (sequences/images/gt_masks) — pass
    `adapter=` for non-DAVIS sources (e.g. data/ytvos.YTVOSDataset).
    """

    def __init__(self, root: str = "", cfg=None, subset: str = "train",
                 year: str = "2017", clip_len: int = 3, seed: int = 0,
                 adapter=None, emit_uint8: bool = False,
                 shard: tuple[int, int] | None = None):
        """shard=(index, count): restrict sampling to sequences
        [index::count] — a DISJOINT per-rank split for multi-host DP
        without the grain pipeline (grain shards by clip index instead)."""
        self.eval_ds = adapter if adapter is not None else DavisEvalDataset(
            root, subset=subset, year=year)
        self.cfg = cfg
        self.clip_len = clip_len
        self.emit_uint8 = emit_uint8
        self._rng = np.random.default_rng(seed)
        self._shard = shard
        if shard is not None:
            index, count = shard
            if not 0 <= index < count:
                raise ValueError(f"bad shard {shard}")
            if len(self.eval_ds.sequences()[index::count]) == 0:
                raise ValueError(
                    f"shard {shard} is empty: only "
                    f"{len(self.eval_ds.sequences())} sequences")

    def _augment(self, images: np.ndarray, labels: np.ndarray,
                 rng: np.random.Generator | None = None):
        """Joint random scale / crop / hflip over a clip (C14).

        `images` are ImageNet-NORMALIZED floats (every adapter's
        images() contract) — de-normalize back to [0,1] before the uint8
        PIL resize, then re-normalize (or emit the uint8 directly when
        emit_uint8: the trainers' device-side ingest_batch normalizes,
        and the host->device upload ships 4x fewer bytes).
        """
        ch, cw = self.cfg.train.crop_size
        t, h, w = labels.shape
        if rng is None:
            rng = self._rng
        scale = rng.uniform(0.75, 1.25)
        sh, sw = max(ch, int(h * scale)), max(cw, int(w * scale))
        # nearest for labels, bilinear for images (PIL per frame)
        from PIL import Image
        raw = np.clip(images * IMAGENET_STD + IMAGENET_MEAN, 0.0, 1.0)
        imgs = np.stack([
            np.asarray(Image.fromarray(
                (im * 255.0).round().astype(np.uint8)).resize(
                    (sw, sh), Image.BILINEAR), np.uint8)
            for im in raw])
        labs = np.stack([
            np.asarray(Image.fromarray(lb.astype(np.uint8)).resize(
                (sw, sh), Image.NEAREST), np.int32)
            for lb in labels])
        y0 = rng.integers(0, sh - ch + 1)
        x0 = rng.integers(0, sw - cw + 1)
        imgs = imgs[:, y0:y0 + ch, x0:x0 + cw]
        labs = labs[:, y0:y0 + ch, x0:x0 + cw]
        if rng.random() < 0.5:
            imgs = imgs[:, :, ::-1].copy()
            labs = labs[:, :, ::-1].copy()
        if self.emit_uint8:
            return imgs, labs
        return normalize_image(imgs.astype(np.float32) / 255.0), labs

    def sample_clip(self, rng: np.random.Generator | None = None
                    ) -> Dict[str, np.ndarray]:
        """One (ref, prev, cur) clip with remapped compact object ids.

        Pass `rng` for deterministic per-index sampling (grain pipeline).
        Sequences shorter than clip_len are padded by repeating the last
        frame; `frame_valid` marks the real frames (padded frames must not
        contribute loss — the trainers pass it to bootstrapped CE).
        """
        if rng is None:
            rng = self._rng
        o_max = self.cfg.model.max_objects
        seqs = self.eval_ds.sequences()
        if self._shard is not None:
            seqs = seqs[self._shard[0]::self._shard[1]]
        seq = seqs[rng.integers(len(seqs))]
        gt = self.eval_ds.gt_masks(seq)
        raw = self.eval_ds.images(seq)
        t = gt.shape[0]
        frame_valid = np.ones((self.clip_len,), np.float32)
        if self.clip_len == 3 and t >= 2:
            # reference frame + a consecutive (prev, cur) pair elsewhere
            # (all three entries are real frames — triplet semantics)
            ref = int(rng.integers(t))
            cur = int(rng.integers(1, t))
            idx = [ref, cur - 1, cur]
        else:
            n_real = min(t, self.clip_len)
            idx = sorted(rng.choice(t, n_real, replace=False))
            idx = list(idx) + [idx[-1]] * (self.clip_len - n_real)
            frame_valid[n_real:] = 0.0
        images, labels = self._augment(raw[idx], gt[idx], rng)
        # compact remap of object ids present in the clip, capped at O
        present = np.unique(labels)
        present = present[present > 0][:o_max]
        remap = np.zeros(int(gt.max()) + 1, np.int32)
        for new, old in enumerate(present, start=1):
            remap[old] = new
        labels = remap[labels]
        obj_valid = np.zeros((o_max + 1,), np.float32)
        obj_valid[:len(present) + 1] = 1.0
        if self.emit_uint8:
            images, labels = images, labels.astype(np.uint8)
        else:
            images = images.astype(np.float32)
        return {"images": images, "labels": labels,
                "obj_valid": obj_valid, "frame_valid": frame_valid}

    def batch(self, batch_size: int) -> Dict[str, np.ndarray]:
        samples = [self.sample_clip() for _ in range(batch_size)]
        return {k: np.stack([s[k] for s in samples]) for k in samples[0]}
