"""Grain input pipeline (SURVEY.md §8 PR4: "Grain input pipeline").

Replaces the reference's `torch.utils.data.DataLoader(num_workers=N)`
(SURVEY.md C12/C11): a grain `MapDataset` over a virtual epoch of clip
indices, each index deterministically seeding its own RNG (reproducible
regardless of worker count), batched and prefetched with multiprocess
workers. Per-host sharding for the 'data' mesh axis comes from grain's
shard options.
"""

from __future__ import annotations

from typing import Iterator

import numpy as np

from cvpr2020_manet_tpu.config import Config
from cvpr2020_manet_tpu.data.davis import DavisTrainDataset


def make_train_iterator(
    root: str,
    cfg: Config,
    *,
    clip_len: int = 3,
    num_workers: int = 4,
    virtual_epoch: int = 100_000,
    seed: int = 0,
    shard_index: int = 0,
    shard_count: int = 1,
    emit_uint8: bool = False,
) -> Iterator[dict]:
    """Infinite iterator of {'images','labels','obj_valid','frame_valid'}
    batches. `clip_len` > 3 samples stage-2-style clips. emit_uint8
    ships raw uint8 images/labels for the trainers' device-side
    ingest_batch (4x fewer upload bytes)."""
    import grain.python as grain

    ds = DavisTrainDataset(root, cfg, clip_len=clip_len, seed=seed,
                           emit_uint8=emit_uint8)
    batch = cfg.train.batch_size

    def sample(i: int) -> dict:
        rng = np.random.default_rng(
            np.random.SeedSequence([seed, int(i)]))
        return ds.sample_clip(rng)

    pipeline = (
        grain.MapDataset.range(virtual_epoch)
        [shard_index::shard_count]
        .map(sample)
        .repeat(None)
        .batch(batch)
    )
    it = pipeline.to_iter_dataset()
    if num_workers > 0:
        it = it.mp_prefetch(
            grain.MultiprocessingOptions(num_workers=num_workers))
    return iter(it)
