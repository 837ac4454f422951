"""Randomized invariant tests for the protocol stack (SURVEY.md §5:
the upstream `davisinteractive` package carries the protocol's real
tests — these pin the same semantics under fuzzed inputs rather than
single fixtures)."""

import numpy as np
import pytest

from cvpr2020_manet_tpu.interactive.metrics import (
    batched_f_measure, batched_jaccard, f_measure, jaccard)
from cvpr2020_manet_tpu.interactive.robot import InteractiveScribblesRobot
from cvpr2020_manet_tpu.interactive.scribbles import (
    Scribbles, annotated_frames, scribbles2mask)


def _random_payload(rng, frames=4, max_lines=3, max_pts=6, num_objects=3):
    scr = []
    for _ in range(frames):
        lines = []
        for _ in range(rng.integers(0, max_lines + 1)):
            npts = int(rng.integers(1, max_pts + 1))
            path = rng.uniform(0.0, 1.0, size=(npts, 2)).tolist()
            lines.append({"path": path,
                          "object_id": int(rng.integers(0, num_objects + 1))})
        scr.append(lines)
    return {"sequence": "fuzz", "scribbles": scr}


@pytest.mark.parametrize("seed", range(8))
def test_scribbles2mask_fuzz_invariants(seed):
    rng = np.random.default_rng(seed)
    pay = _random_payload(rng)
    h, w = int(rng.integers(8, 64)), int(rng.integers(8, 64))
    m = scribbles2mask(pay, (h, w))
    assert m.shape == (4, h, w) and m.dtype == np.int32
    # values: default or a drawn object id
    drawn = {int(l["object_id"]) for lines in pay["scribbles"] for l in lines}
    assert set(np.unique(m)) <= ({-1} | drawn)
    # frames without lines stay untouched; annotated frames (nonempty
    # paths always rasterize >= 1 pixel) are marked
    ann = set(annotated_frames(pay))
    for f in range(4):
        marked = np.count_nonzero(m[f] >= 0)
        assert (marked > 0) == (f in ann)
    # every marked pixel lies inside the union of the frame's per-line
    # bounding boxes (Bresenham never escapes a segment's bbox)
    for f in ann:
        allowed = np.zeros((h, w), bool)
        for line in pay["scribbles"][f]:
            p = np.asarray(line["path"])
            x0 = int(np.clip(np.floor(p[:, 0].min() * (w - 1)), 0, w - 1))
            x1 = int(np.clip(np.ceil(p[:, 0].max() * (w - 1)), 0, w - 1))
            y0 = int(np.clip(np.floor(p[:, 1].min() * (h - 1)), 0, h - 1))
            y1 = int(np.clip(np.ceil(p[:, 1].max() * (h - 1)), 0, h - 1))
            allowed[y0:y1 + 1, x0:x1 + 1] = True
        assert np.all(allowed[m[f] >= 0])


@pytest.mark.parametrize("seed", range(6))
def test_metrics_fuzz_ranges_and_identities(seed):
    rng = np.random.default_rng(100 + seed)
    t, h, w, o = 3, 24, 24, int(rng.integers(1, 4))
    gt = rng.integers(0, o + 1, size=(t, h, w)).astype(np.int32)
    pred = rng.integers(0, o + 1, size=(t, h, w)).astype(np.int32)
    j = batched_jaccard(pred, gt, o)
    f = batched_f_measure(pred, gt, o)
    assert j.shape == f.shape == (t,)
    assert np.all((0.0 <= j) & (j <= 1.0))
    assert np.all((0.0 <= f) & (f <= 1.0))
    # identities: perfect prediction scores 1 on both axes
    np.testing.assert_allclose(batched_jaccard(gt, gt, o), 1.0)
    np.testing.assert_allclose(batched_f_measure(gt, gt, o), 1.0)
    # J is symmetric in its two masks
    for t_i in range(t):
        a, b = pred[t_i] == 1, gt[t_i] == 1
        assert jaccard(a, b) == jaccard(b, a)
        assert f_measure(a, b) == pytest.approx(f_measure(b, a))


@pytest.mark.parametrize("seed", range(4))
def test_f_measure_matches_bruteforce_oracle(seed):
    """Independent oracle: the dilation/EDT-based boundary F equals a
    brute-force pairwise-distance matcher (a pred-boundary pixel is a
    true positive iff some gt-boundary pixel lies within bound_pix
    euclidean distance — the definition the disk dilation encodes)."""
    from cvpr2020_manet_tpu.interactive.metrics import _mask_boundary

    def brute_f(pred, gt, bound_th=0.008):
        pred, gt = pred.astype(bool), gt.astype(bool)
        if not pred.any() and not gt.any():
            return 1.0
        r2 = max(1, int(np.ceil(
            bound_th * np.linalg.norm(pred.shape)))) ** 2
        pb = np.argwhere(_mask_boundary(pred))
        gb = np.argwhere(_mask_boundary(gt))
        if len(pb) == 0 and len(gb) == 0:
            return 1.0
        if len(pb) == 0 or len(gb) == 0:
            return 0.0
        d2 = ((pb[:, None, :] - gb[None, :, :]) ** 2).sum(-1)
        precision = (d2.min(axis=1) <= r2).mean()
        recall = (d2.min(axis=0) <= r2).mean()
        if precision + recall == 0:
            return 0.0
        return float(2 * precision * recall / (precision + recall))

    rng = np.random.default_rng(400 + seed)
    for _ in range(4):
        h, w = int(rng.integers(10, 40)), int(rng.integers(10, 40))
        pred = np.zeros((h, w), bool)
        gt = np.zeros((h, w), bool)
        for m in (pred, gt):
            for _ in range(rng.integers(1, 3)):
                y, x = rng.integers(0, h - 4), rng.integers(0, w - 4)
                dy, dx = rng.integers(2, 8, size=2)
                m[y:y + dy, x:x + dx] = True
        got = f_measure(pred, gt)
        want = brute_f(pred, gt)
        assert got == pytest.approx(want, abs=1e-12), (got, want)


def test_metrics_disjoint_and_empty_conventions():
    a = np.zeros((8, 8), bool)
    b = np.zeros((8, 8), bool)
    b[:4] = True
    # both empty -> perfect agreement (davisinteractive convention)
    assert jaccard(a, a) == 1.0 and f_measure(a, a) == 1.0
    # one empty -> 0
    assert jaccard(a, b) == 0.0 and f_measure(a, b) == 0.0
    # disjoint non-empty -> 0 jaccard
    c = np.zeros((8, 8), bool)
    c[4:] = True
    assert jaccard(b, c) == 0.0


@pytest.mark.parametrize("seed", range(5))
def test_robot_fuzz_payload_schema(seed):
    """Random pred/gt disagreement -> the robot always emits a valid
    protocol payload: normalized paths, legal object ids, exactly one
    annotated frame, >= min_path_nodes points per line."""
    rng = np.random.default_rng(200 + seed)
    t, h, w, o = 4, 32, 32, 2
    gt = np.zeros((t, h, w), np.int32)
    for obj in range(1, o + 1):
        y, x = rng.integers(0, h - 12), rng.integers(0, w - 12)
        gt[:, y:y + 12, x:x + 12] = obj
    # contiguous misses (the case the robot targets): each object loses
    # a random half of its box in the prediction
    pred = gt.copy()
    for obj in range(1, o + 1):
        ys, xs = np.where(gt[0] == obj)
        if rng.random() < 0.5:
            cut = ys >= np.median(ys)
        else:
            cut = xs >= np.median(xs)
        pred[:, ys[cut], xs[cut]] = 0
    robot = InteractiveScribblesRobot()
    scr = robot.interact("fuzz", pred, gt, o)
    assert isinstance(scr, Scribbles)
    assert scr.num_frames == t
    ann = annotated_frames(scr)
    assert len(ann) == 1
    lines = scr.scribbles[ann[0]]
    assert len(lines) >= 1
    for line in lines:
        path = np.asarray(line["path"])
        assert path.ndim == 2 and path.shape[1] == 2
        assert len(path) >= robot.params.min_path_nodes
        assert path.min() >= 0.0 and path.max() <= 1.0
        assert 0 <= int(line["object_id"]) <= o
    # rasterized corrections mostly land on true error pixels of their
    # object (spine paths live inside eroded error regions; Bresenham
    # segments between subsampled nodes may graze the boundary)
    masks = scribbles2mask(scr, (h, w))
    fr = ann[0]
    for obj in {int(l["object_id"]) for l in lines}:
        on = masks[fr] == obj
        err = (gt[fr] == obj) & (pred[fr] != obj)
        hit = np.count_nonzero(on & err) / max(np.count_nonzero(on), 1)
        assert hit > 0.8, (obj, hit)


@pytest.mark.parametrize("seed", range(3))
def test_session_fuzz_random_model(seed):
    """A model emitting random garbage masks still drives the protocol
    to completion with a well-formed report (ranges, row accounting,
    positive per-row timing, bounded AUC)."""
    from cvpr2020_manet_tpu.data import SyntheticDataset
    from cvpr2020_manet_tpu.interactive.session import InteractiveSession

    rng = np.random.default_rng(300 + seed)
    ds = SyntheticDataset(num_sequences=2, scribble_sets=1, num_frames=3)
    session = InteractiveSession(ds, max_interactions=3)
    rounds = {}
    with session as sess:
        while sess.next():
            seq, scr, _ = sess.get_scribbles(only_last=True)
            gt = ds.gt_masks(seq)
            n = ds.num_objects(seq)
            sess.submit_masks(
                rng.integers(0, n + 1, size=gt.shape).astype(np.int32))
            rounds[sess.current] = rounds.get(sess.current, 0) + 1

    # random masks always leave errors -> every item runs all rounds
    assert all(v == 3 for v in rounds.values()) and len(rounds) == 2
    report = session.get_report()
    per_item_rows = 3 * 2 * 3                  # rounds x objects x frames
    assert len(report) == 2 * per_item_rows
    assert ((0.0 <= report.jaccard) & (report.jaccard <= 1.0)).all()
    assert ((0.0 <= report.contour) & (report.contour <= 1.0)).all()
    assert (report.timing > 0.0).all()
    # timing is cumulative within an item across interactions
    for seq in report.sequence.unique():
        t = report[report.sequence == seq].groupby(
            "interaction").timing.first()
        assert t.is_monotonic_increasing
    summary = session.get_global_summary(max_time=60.0, at_threshold=30.0)
    assert 0.0 <= summary["auc"] <= 1.0


def test_robot_min_path_nodes_one_does_not_crash():
    """min_path_nodes=1 (upstream robot's min_nb_nodes can be 1) must not
    divide by zero in the subsampling stride."""
    import dataclasses

    from cvpr2020_manet_tpu.interactive.robot import RobotParams
    gt = np.zeros((2, 16, 16), np.int32)
    gt[:, 4:12, 4:12] = 1
    robot = InteractiveScribblesRobot(
        dataclasses.replace(RobotParams(), min_path_nodes=1))
    scr = robot.interact("one", np.zeros_like(gt), gt, 1)
    assert sum(len(l) for l in scr.scribbles) >= 1


def test_robot_perfect_prediction_yields_empty_payload():
    rng = np.random.default_rng(0)
    gt = np.zeros((3, 16, 16), np.int32)
    gt[:, 4:12, 4:12] = 1
    robot = InteractiveScribblesRobot()
    scr = robot.interact("perfect", gt.copy(), gt, 1)
    assert all(len(l) == 0 for l in scr.scribbles)
