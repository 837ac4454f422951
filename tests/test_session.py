"""End-to-end interactive protocol tests on the synthetic fixture."""

import numpy as np
import pytest

from cvpr2020_manet_tpu.data import SyntheticDataset
from cvpr2020_manet_tpu.interactive.session import InteractiveSession


class OracleModel:
    """Submits ground truth after round k for k>=1 — sanity-check the
    session bookkeeping and the report math without a neural net."""

    def __init__(self, dataset):
        self.dataset = dataset

    def predict(self, seq, round_idx):
        gt = self.dataset.gt_masks(seq)
        if round_idx == 0:
            return np.zeros_like(gt)
        return gt.copy()


def test_session_full_protocol_and_report():
    ds = SyntheticDataset(num_sequences=2, scribble_sets=2, num_frames=3)
    session = InteractiveSession(ds, max_interactions=3,
                                 time_fn=_fake_clock())
    model = OracleModel(ds)
    rounds = {}
    with session as sess:
        while sess.next():
            seq, scribbles, first = sess.get_scribbles(only_last=True)
            key = sess.current
            r = rounds.get(key, 0)
            assert first == (r == 0)
            # scribbles always annotate exactly one frame
            frames = [i for i, s in enumerate(scribbles["scribbles"]) if s]
            assert len(frames) == 1
            sess.submit_masks(model.predict(seq, r))
            rounds[key] = r + 1

    # GT submitted at round 1 is perfect -> robot has nothing to correct,
    # items end early after 2 rounds
    assert all(v == 2 for v in rounds.values())
    assert len(rounds) == 4                     # 2 sequences x 2 sets
    report = session.get_report()
    # rows: seq x set x rounds x objects x frames
    assert len(report) == 2 * 2 * 2 * 2 * 3
    # round 0 (all-background) scores 0, later rounds (GT) score 1
    r0 = report[report.interaction == 0]
    r1 = report[report.interaction == 1]
    assert r0.jaccard.max() == 0.0
    assert r1.jaccard.min() == 1.0 and r1.contour.min() == 1.0

    summary = session.get_global_summary(max_time=10.0, at_threshold=5.0)
    # quality jumps to 1.0 after round 1 -> AUC strictly between 0 and 1
    assert 0.5 < summary["auc"] < 1.0
    assert summary["metric_at_threshold"] == 1.0


def test_session_max_time_stops_item():
    """davisinteractive semantics: an item ends when cumulative service
    time exceeds max_time * n_objects, even with interactions left."""
    ds = SyntheticDataset(num_sequences=1, scribble_sets=1, num_frames=3)
    n_obj = ds.num_objects(ds.sequences()[0])
    # fake clock ticks 1 s per call; each round costs >= 1 s of model time
    session = InteractiveSession(ds, max_interactions=8,
                                 max_time=2.0 / max(n_obj, 1),
                                 time_fn=_fake_clock())
    rounds = 0
    with session as sess:
        while sess.next():
            seq, _, _ = sess.get_scribbles()
            sess.submit_masks(np.zeros_like(ds.gt_masks(seq)))
            rounds += 1
    assert rounds < 8
    report = session.get_report()
    assert report.interaction.max() == rounds - 1


def test_session_timing_includes_robot_time():
    """The scribble robot runs inside the service; its wall-clock lands in
    the NEXT round's cumulative timestamp (davisinteractive semantics)."""
    ds = SyntheticDataset(num_sequences=1, scribble_sets=1, num_frames=3)

    class SlowRobot:
        def __init__(self, inner, clock):
            self.inner, self.clock = inner, clock

        def interact(self, *a, **kw):
            for _ in range(5):      # 5 fake seconds of robot time
                self.clock()
            return self.inner.interact(*a, **kw)

    clock = _fake_clock()
    from cvpr2020_manet_tpu.interactive.robot import InteractiveScribblesRobot
    session = InteractiveSession(
        ds, max_interactions=2, time_fn=clock,
        robot=SlowRobot(InteractiveScribblesRobot(), clock))
    with session as sess:
        while sess.next():
            seq, _, _ = sess.get_scribbles()
            sess.submit_masks(np.zeros_like(ds.gt_masks(seq)))
    report = session.get_report()
    t0 = report[report.interaction == 0].timing.max()
    t1 = report[report.interaction == 1].timing.max()
    # round 1's timestamp carries round 0's model time + 5 s robot + its own
    assert t1 - t0 >= 5.0


def test_session_enforces_ordering():
    ds = SyntheticDataset(num_sequences=1, scribble_sets=1, num_frames=2)
    session = InteractiveSession(ds, max_interactions=2)
    with pytest.raises(RuntimeError):
        session.submit_masks(np.zeros_like(ds.gt_masks("synth_00")))
    assert session.next()
    with pytest.raises(RuntimeError):
        session.next()


def _fake_clock():
    state = {"t": 0.0}

    def clock():
        state["t"] += 1.0
        return state["t"]
    return clock


def test_davisinteractive_compat_constructor():
    """DavisInteractiveSession mirrors the upstream constructor signature
    (host/key ignored, max_nb_interactions, max_time, dataset= override)."""
    from cvpr2020_manet_tpu.interactive.session import DavisInteractiveSession

    ds = SyntheticDataset(num_sequences=1, scribble_sets=1, num_frames=2)
    with DavisInteractiveSession(host="localhost",
                                 max_nb_interactions=2,
                                 max_time=None, dataset=ds) as sess:
        assert sess.max_interactions == 2
        assert sess.next()
        seq, scribbles, first = sess.get_scribbles()
        assert first and scribbles["scribbles"]
        sess.submit_masks(np.zeros_like(ds.gt_masks(seq)))

    with pytest.raises(ValueError, match="davis_root"):
        DavisInteractiveSession()


def test_global_summary_curve_math():
    """AUC/J&F@t semantics pinned on a hand-built report: quality at time
    t is the J&F of the LAST interaction whose cumulative time <= t (0
    before the first), averaged over items, integrated over [0, T]."""
    ds = SyntheticDataset(num_sequences=1, scribble_sets=1, num_frames=2)
    session = InteractiveSession(ds, max_interactions=2)
    # hand-written rows: one sequence, one set, two interactions
    # interaction 0 lands at t=2 with J&F 0.5; interaction 1 at t=6, 0.9
    for inter, t, jf in ((0, 2.0, 0.5), (1, 6.0, 0.9)):
        for frame in range(2):
            session._rows.append(dict(
                sequence="synth_00", scribble_idx=0, interaction=inter,
                object_id=1, frame=frame, jaccard=jf, contour=jf, timing=t))
    s = session.get_global_summary(max_time=10.0, at_threshold=4.0)
    # curve: 0 on [0,2), 0.5 on [2,6), 0.9 on [6,10]
    # integral = 0*2 + 0.5*4 + 0.9*4 = 5.6 -> AUC = 0.56
    assert abs(s["auc"] - 0.56) < 0.01
    assert abs(s["metric_at_threshold"] - 0.5) < 1e-6
    # before any interaction completes, quality is 0
    grid, curve = s["curve"]
    assert curve[0] == 0.0


def test_synthetic_entry_frames_and_hidden_spans():
    """Data-level semantics of the hard-task knobs (docs/QUALITY.md):
    entry_frames delays an object's first appearance; hidden_spans fully
    occludes it for [start, end). Labels and pixels must agree."""
    ds = SyntheticDataset(image_size=(32, 48), num_frames=6,
                          num_sequences=1, num_objects=2, scribble_sets=1,
                          seed=3, entry_frames=[0, 1],
                          hidden_spans={1: (3, 5)})
    gt = ds.gt_masks(ds.sequences()[0])
    present = [(gt[f] == 2).any() for f in range(6)]
    assert present == [False, True, True, False, False, True]
    assert all((gt[f] == 1).any() for f in range(6))  # object 1 unaffected
    # occluded frames show background texture where the object was
    imgs = ds.images(ds.sequences()[0])
    assert not np.array_equal(imgs[2], imgs[3])


def test_session_resume_hooks():
    """skip_items / seed_rows / on_item_end — the resume contract:
    on_item_end fires exactly once per finished item (including the last
    one), and a session resumed from a partial report reproduces the
    full run's report and summary exactly."""
    ds = SyntheticDataset(num_sequences=2, scribble_sets=2, num_frames=3)
    model = OracleModel(ds)

    def drive(session):
        rounds = {}
        with session as sess:
            while sess.next():
                seq, _, _ = sess.get_scribbles(only_last=True)
                r = rounds.get(sess.current, 0)
                sess.submit_masks(model.predict(seq, r))
                rounds[sess.current] = r + 1
        return session

    done = []
    full = drive(InteractiveSession(ds, max_interactions=3,
                                    time_fn=_fake_clock(),
                                    on_item_end=lambda s, i: done.append((s, i))))
    all_items = [(s, i) for s in ds.sequences() for i in range(2)]
    assert done == all_items                    # once per item, in order
    full_report = full.get_report()

    # "interrupted" state: the first two items completed
    completed = set(all_items[:2])
    seed = full_report[full_report.apply(
        lambda r: (r["sequence"], r["scribble_idx"]) in completed,
        axis=1)].to_dict("records")
    resumed = drive(InteractiveSession(ds, max_interactions=3,
                                       time_fn=_fake_clock(),
                                       skip_items=completed,
                                       seed_rows=seed))
    import pandas as pd
    pd.testing.assert_frame_equal(
        resumed.get_report().reset_index(drop=True),
        full_report.reset_index(drop=True))
    rs, fs = resumed.get_global_summary(), full.get_global_summary()
    assert rs["auc"] == fs["auc"]
    assert rs["metric_at_threshold"] == fs["metric_at_threshold"]
    np.testing.assert_array_equal(rs["curve"][1], fs["curve"][1])
