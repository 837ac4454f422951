"""YouTube-VOS adapter over a synthetic on-disk tree."""

import json

import numpy as np
import pytest
from PIL import Image

from cvpr2020_manet_tpu.config import tiny_test_config
from cvpr2020_manet_tpu.data.davis import DavisTrainDataset
from cvpr2020_manet_tpu.data.ytvos import YTVOSDataset
from cvpr2020_manet_tpu.utils.colormap import davis_palette


@pytest.fixture
def ytvos_root(tmp_path):
    root = tmp_path / "ytvos"
    rng = np.random.default_rng(0)
    h, w, t = 64, 96, 3
    videos = {}
    for seq in ["vid_a", "vid_b"]:
        (root / "train" / "JPEGImages" / seq).mkdir(parents=True)
        (root / "train" / "Annotations" / seq).mkdir(parents=True)
        for f in range(t):
            img = (rng.random((h, w, 3)) * 255).astype(np.uint8)
            Image.fromarray(img).save(
                root / "train" / "JPEGImages" / seq / f"{f * 5:05d}.jpg")
            mask = np.zeros((h, w), np.uint8)
            mask[10:30, 10:40] = 1
            m = Image.fromarray(mask, mode="P")
            m.putpalette(davis_palette().reshape(-1).tolist())
            m.save(root / "train" / "Annotations" / seq / f"{f * 5:05d}.png")
        videos[seq] = {"objects": {"1": {"frames": []}}}
    with open(root / "train" / "meta.json", "w") as fp:
        json.dump({"videos": videos}, fp)
    return str(root)


def test_ytvos_adapter(ytvos_root):
    ds = YTVOSDataset(ytvos_root)
    assert ds.sequences() == ["vid_a", "vid_b"]
    assert ds.images("vid_a").shape == (3, 64, 96, 3)
    assert ds.gt_masks("vid_a").shape == (3, 64, 96)
    assert ds.num_objects("vid_a") == 1


def test_train_sampler_over_ytvos(ytvos_root):
    cfg = tiny_test_config()
    train = DavisTrainDataset(cfg=cfg, adapter=YTVOSDataset(ytvos_root))
    batch = train.batch(2)
    ch, cw = cfg.train.crop_size
    assert batch["images"].shape == (2, 3, ch, cw, 3)
    assert batch["labels"].max() <= cfg.model.max_objects
