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


def test_synthesized_scribbles_are_line_like_and_cover_blobs():
    """Eval-robot resemblance (SURVEY.md C16): strokes are spatially
    coherent lines (elongated, connected), not scatter, and multiple error
    blobs each get covered."""
    h, w, o = 32, 32, 2
    gt = np.zeros((h, w), np.int64)
    gt[4:14, 4:14] = 1                 # blob A
    gt[20:30, 20:30] = 1               # blob B
    gt_oh = jax.nn.one_hot(jnp.array(gt), o)
    pred = jnp.zeros((h, w), jnp.int32)
    obj_valid = jnp.array([1.0, 1.0])
    pos, _ = _synthesize_scribbles(
        jax.random.PRNGKey(3), gt_oh, pred, obj_valid)
    stroke = np.asarray(pos[..., 1]) > 0
    ys, xs = np.nonzero(stroke)
    assert len(ys) >= 8                # a real stroke, not a couple pixels
    # elongation: the point cloud's principal axis dominates (line-like).
    # two separated parallel strokes are still line-like jointly only if
    # each is; check per-blob.
    for sl in (np.s_[:16, :16], np.s_[16:, 16:]):
        by, bx = np.nonzero(stroke[sl])
        assert len(by) >= 4, "each error blob gets a stroke"
        pts = np.stack([by, bx], 1).astype(np.float64)
        cov = np.cov((pts - pts.mean(0)).T)
        evals = np.sort(np.linalg.eigvalsh(cov))
        assert evals[1] > 6 * max(evals[0], 1e-9), "stroke is elongated"
    # connectivity: pixels of each blob's stroke form one 8-connected chain
    for sl in (np.s_[:16, :16], np.s_[16:, 16:]):
        sub = stroke[sl]
        by, bx = np.nonzero(sub)
        seen = {(by[0], bx[0])}
        frontier = [(by[0], bx[0])]
        pix = set(zip(by.tolist(), bx.tolist()))
        while frontier:
            y, x = frontier.pop()
            for dy in (-1, 0, 1):
                for dx in (-1, 0, 1):
                    p = (y + dy, x + dx)
                    if p in pix and p not in seen:
                        seen.add(p)
                        frontier.append(p)
        assert len(seen) == len(pix), "stroke is connected"


def test_synthesized_background_correction_strokes():
    """False positives (pred says object, gt says background) produce
    background strokes — channel 0 — which become the object's negatives."""
    h, w, o = 16, 16, 2
    gt = np.zeros((h, w), np.int64)                 # all background
    gt_oh = jax.nn.one_hot(jnp.array(gt), o)
    pred = jnp.zeros((h, w), jnp.int32).at[4:12, 4:12].set(1)  # FP blob
    obj_valid = jnp.array([1.0, 1.0])
    pos, neg = _synthesize_scribbles(
        jax.random.PRNGKey(0), gt_oh, pred, obj_valid)
    bg = np.asarray(pos[..., 0])
    ys, xs = np.nonzero(bg)
    assert len(ys) > 0, "background-correction stroke exists"
    assert (np.asarray(pred)[ys, xs] == 1).all(), "stroke lies on the FP"
    # the background stroke is object 1's negative scribble
    assert (np.asarray(neg[..., 1])[ys, xs] == 1).all()


def test_stage2_step_runs_and_learns():
    cfg = tiny_test_config()
    trainer = Stage2Trainer(cfg)
    rng = np.random.default_rng(0)
    batch = synthetic_batch(cfg, rng)
    losses = [float(trainer.train_step(batch)["loss"]) for _ in range(4)]
    assert np.isfinite(losses).all()
    assert losses[-1] < losses[0]


def test_stage2_gmap_memory_threads_across_rounds():
    """TrainConfig.stage2_gmap_memory threads the C8 min-fusion memory
    through the simulated rounds (eval semantics). With ONE simulated
    round the two settings are identical (round 0's memory is all-ones
    either way); with several rounds they must diverge — the memory
    actually reaches the later rounds' propagation."""
    import dataclasses

    from cvpr2020_manet_tpu.engine.train_stage2 import forward_sample_stage2
    from cvpr2020_manet_tpu.models.manet import MANet

    base = tiny_test_config()
    rng = np.random.default_rng(1)

    def run(rounds, gmap_memory):
        cfg = dataclasses.replace(base, train=dataclasses.replace(
            base.train, stage2_rounds=rounds,
            stage2_gmap_memory=gmap_memory))
        model = MANet(cfg.model, matching_backend="jnp")
        h, w = cfg.train.crop_size
        o = cfg.model.max_objects + 1
        variables = jax.jit(model.init)(
            jax.random.PRNGKey(0), jnp.zeros((1, h, w, 3)),
            jnp.zeros((1, h // 4, w // 4, o)),
            jnp.zeros((1, h // 4, w // 4, o)))
        batch = synthetic_batch(cfg, np.random.default_rng(1), batch_size=1)
        return forward_sample_stage2(
            model, variables["params"], jnp.asarray(batch["images"][0]),
            jnp.asarray(batch["labels"][0]),
            jnp.asarray(batch["obj_valid"][0]), cfg, jax.random.PRNGKey(3))

    one_on = np.asarray(run(1, True))
    one_off = np.asarray(run(1, False))
    np.testing.assert_allclose(one_on, one_off, atol=1e-5)

    multi_on = np.asarray(run(3, True))
    multi_off = np.asarray(run(3, False))
    np.testing.assert_allclose(multi_on[0], multi_off[0], atol=1e-5)
    assert np.abs(multi_on[1:] - multi_off[1:]).max() > 1e-4


def test_stage2_uint8_ingest_smoke():
    """Stage-2 shares train_stage1.ingest_batch: uint8 feed trains."""
    import numpy as np
    from cvpr2020_manet_tpu.config import tiny_test_config
    from cvpr2020_manet_tpu.engine.train_stage1 import synthetic_batch
    from cvpr2020_manet_tpu.engine.train_stage2 import Stage2Trainer
    cfg = tiny_test_config()
    rng = np.random.default_rng(0)
    b = synthetic_batch(cfg, rng, random_entry=True, as_uint8=True)
    tr = Stage2Trainer(cfg)
    m = tr.train_step(b)
    assert np.isfinite(m["loss"])
