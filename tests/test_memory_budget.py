"""HBM budget check for the flagship eval config (v5e has 16 GB).

The per-sequence device state is the big consumer:
feature/embedding caches (bf16) + prev_masks + gmap_mem. This test is the
analytic guard that a full-length DAVIS sequence fits with headroom for
the round graph's transients.
"""

import numpy as np

from cvpr2020_manet_tpu.config import Config

HBM_BYTES = 16e9
BUDGET_FRACTION = 0.6   # leave 40% for transients/workspace


def eval_state_bytes(cfg: Config) -> float:
    t = cfg.eval.max_frames
    h = (cfg.eval.image_size[0] + (-cfg.eval.image_size[0]) % cfg.eval.pad_to) // 4
    w = (cfg.eval.image_size[1] + (-cfg.eval.image_size[1]) % cfg.eval.pad_to) // 4
    o = cfg.model.max_objects + 1
    bf16 = 2
    feat = t * h * w * cfg.model.decoder_channels * bf16
    emb = t * h * w * cfg.model.embedding_dim_padded * bf16
    prev_masks = t * h * w * o * bf16
    gmap = t * h * w * o * bf16
    int_mem = o * h * w * cfg.model.ma_channels * 4
    return feat + emb + prev_masks + gmap + int_mem


def test_flagship_eval_state_fits_hbm():
    cfg = Config()
    total = eval_state_bytes(cfg)
    assert total < HBM_BYTES * BUDGET_FRACTION, (
        f"eval state {total / 1e9:.1f} GB exceeds "
        f"{BUDGET_FRACTION:.0%} of HBM — shrink buckets or dtypes")
