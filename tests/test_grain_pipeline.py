"""Grain input pipeline over the synthetic on-disk DAVIS tree."""

import numpy as np

from cvpr2020_manet_tpu.config import tiny_test_config
from cvpr2020_manet_tpu.data.grain_pipeline import make_train_iterator


def test_grain_iterator_batches(davis_root):  # noqa: F811
    cfg = tiny_test_config()
    it = make_train_iterator(davis_root, cfg, num_workers=0, seed=1)
    b1 = next(it)
    b2 = next(it)
    ch, cw = cfg.train.crop_size
    assert b1["images"].shape == (cfg.train.batch_size, 3, ch, cw, 3)
    assert b1["labels"].shape == (cfg.train.batch_size, 3, ch, cw)
    # different steps yield different samples
    assert not np.array_equal(b1["images"], b2["images"])


def test_grain_determinism_and_sharding(davis_root):  # noqa: F811
    cfg = tiny_test_config()
    a = next(make_train_iterator(davis_root, cfg, num_workers=0, seed=7))
    b = next(make_train_iterator(davis_root, cfg, num_workers=0, seed=7))
    np.testing.assert_array_equal(a["images"], b["images"])
    # different shards see different data
    s0 = next(make_train_iterator(davis_root, cfg, num_workers=0, seed=7,
                                  shard_index=0, shard_count=2))
    s1 = next(make_train_iterator(davis_root, cfg, num_workers=0, seed=7,
                                  shard_index=1, shard_count=2))
    assert not np.array_equal(s0["images"], s1["images"])
