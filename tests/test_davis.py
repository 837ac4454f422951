"""DAVIS adapters tested against a synthetic on-disk DAVIS tree."""

import numpy as np

from cvpr2020_manet_tpu.config import tiny_test_config
from cvpr2020_manet_tpu.data.davis import (
    DavisEvalDataset, DavisTrainDataset, normalize_image)


# davis_root fixture (synthetic on-disk DAVIS tree) lives in conftest.py —
# shared with the shim tests.


def test_eval_dataset_reads_tree(davis_root):
    ds = DavisEvalDataset(davis_root, subset="val")
    assert ds.sequences() == ["seq_a", "seq_b"]
    imgs = ds.images("seq_a")
    gt = ds.gt_masks("seq_a")
    assert imgs.shape == (4, 64, 96, 3)
    assert gt.shape == (4, 64, 96)
    assert ds.num_objects("seq_a") == 2
    scr = ds.initial_scribbles("seq_a", 0)
    assert scr.sequence == "seq_a"
    assert len(scr.scribbles) == 4 and scr.scribbles[0]


def test_train_dataset_batches(davis_root):
    cfg = tiny_test_config()
    ds = DavisTrainDataset(davis_root, cfg, subset="train")
    batch = ds.batch(2)
    ch, cw = cfg.train.crop_size
    assert batch["images"].shape == (2, 3, ch, cw, 3)
    assert batch["labels"].shape == (2, 3, ch, cw)
    assert batch["obj_valid"].shape == (2, cfg.model.max_objects + 1)
    # labels are compact ids within the object budget
    assert batch["labels"].max() <= cfg.model.max_objects
    assert batch["labels"].min() >= 0
    # images normalized (not raw [0,1])
    assert batch["images"].min() < -0.5


def test_normalize_image_stats():
    img = np.ones((4, 4, 3), np.float32) * 0.485
    out = normalize_image(img)
    np.testing.assert_allclose(out[..., 0], 0.0, atol=1e-6)


def test_augment_round_trips_pixel_values(davis_root):
    """Regression: _augment receives NORMALIZED floats and must
    de-normalize before its uint8 resize — the old code clipped
    normalized values to [0,1] (crushing mid-tones) and normalized
    AGAIN on the way out."""
    from cvpr2020_manet_tpu.data.davis import IMAGENET_MEAN, IMAGENET_STD
    cfg = tiny_test_config()
    ds = DavisTrainDataset(davis_root, cfg, subset="train", seed=3)
    # constant mid-gray clip: any scale/crop/flip keeps it constant,
    # so the output must de-normalize back to exactly that gray
    raw = np.full((3, 64, 96, 3), 0.6, np.float32)
    norm = normalize_image(raw)
    imgs, labs = ds._augment(norm, np.zeros((3, 64, 96), np.int32))
    denorm = imgs * IMAGENET_STD + IMAGENET_MEAN
    np.testing.assert_allclose(denorm, 0.6, atol=2 / 255)


def test_train_dataset_uint8_emission(davis_root):
    cfg = tiny_test_config()
    ds = DavisTrainDataset(davis_root, cfg, subset="train",
                           emit_uint8=True)
    batch = ds.batch(2)
    assert batch["images"].dtype == np.uint8
    assert batch["labels"].dtype == np.uint8
    ch, cw = cfg.train.crop_size
    assert batch["images"].shape == (2, 3, ch, cw, 3)
    assert batch["labels"].max() <= cfg.model.max_objects
