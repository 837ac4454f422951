"""Stage-2 (multi-round interaction + MA) training tests."""

import jax
import jax.numpy as jnp
import numpy as np

from cvpr2020_manet_tpu.config import tiny_test_config
from cvpr2020_manet_tpu.engine.train_stage2 import (
    Stage2Trainer, _soft_iou_per_frame, _synthesize_scribbles,
    synthetic_batch)


def test_soft_iou_identifies_worst_frame():
    f, h, w, o = 3, 8, 8, 3
    gt = jnp.zeros((f, h, w, o)).at[..., 1].set(1.0)
    probs = gt.at[1].set(jnp.zeros((h, w, o)).at[..., 0].set(1.0))
    obj_valid = jnp.array([1.0, 1.0, 0.0])
    iou = _soft_iou_per_frame(probs, gt, obj_valid)
    assert int(jnp.argmin(iou)) == 1


def test_synthesized_scribbles_inside_error_region(rng):
    h, w, o = 16, 16, 3
    gt = np.zeros((h, w), np.int64)
    gt[4:12, 4:12] = 1
    gt_oh = jax.nn.one_hot(jnp.array(gt), o)
    pred = jnp.zeros((h, w), jnp.int32)      # predicts all background
    obj_valid = jnp.array([1.0, 1.0, 0.0])
    pos, neg = _synthesize_scribbles(
        jax.random.PRNGKey(0), gt_oh, pred, obj_valid)
    pos = np.asarray(pos)
    # object-1 scribbles only where gt==1 and prediction wrong
    ys, xs = np.nonzero(pos[..., 1])
    assert len(ys) > 0
    assert (gt[ys, xs] == 1).all()
    # no scribbles for invalid object
    assert pos[..., 2].sum() == 0
    # pos and neg disjoint
    assert not ((pos > 0) & (np.asarray(neg) > 0)).any()


def test_stage2_step_runs_and_learns():
    cfg = tiny_test_config()
    trainer = Stage2Trainer(cfg)
    rng = np.random.default_rng(0)
    batch = synthetic_batch(cfg, rng)
    losses = [float(trainer.train_step(batch)["loss"]) for _ in range(4)]
    assert np.isfinite(losses).all()
    assert losses[-1] < losses[0]
