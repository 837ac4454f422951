"""The `davisinteractive` compat shim: upstream-API code (the way
lightas/CVPR2020_MANet's eval script is written — SURVEY.md §4.1) must
run unmodified against the in-repo protocol stack."""

import numpy as np
import pytest

from cvpr2020_manet_tpu.data import SyntheticDataset
from cvpr2020_manet_tpu.interactive import metrics as fw_metrics
from cvpr2020_manet_tpu.interactive import scribbles as fw_scribbles


def _payload(sequence="seq", frames=3):
    """A small 2-frame-annotated scribble payload in protocol JSON."""
    lines0 = [
        {"path": [[0.1, 0.1], [0.8, 0.1]], "object_id": 1},
        {"path": [[0.1, 0.9], [0.9, 0.9]], "object_id": 0},
    ]
    lines2 = [{"path": [[0.5, 0.2], [0.5, 0.8]], "object_id": 2}]
    scr = [[] for _ in range(frames)]
    scr[0] = lines0
    scr[2 % frames] = lines2
    return {"sequence": sequence, "scribbles": scr}


# ---------------------------------------------------------------- utils


def test_annotated_frames_and_is_empty():
    from davisinteractive.utils.scribbles import (
        annotated_frames, annotated_frames_object, is_empty)
    pay = _payload()
    assert annotated_frames(pay) == [0, 2]
    assert annotated_frames_object(pay, 1) == [0]
    assert annotated_frames_object(pay, 2) == [2]
    assert not is_empty(pay)
    assert is_empty({"sequence": "s", "scribbles": [[], []]})


def test_fuse_scribbles():
    from davisinteractive.utils.scribbles import fuse_scribbles
    a, b = _payload(), _payload()
    fused = fuse_scribbles(a, b)
    assert len(fused["scribbles"][0]) == 4      # 2 + 2 lines
    assert len(fused["scribbles"][1]) == 0
    with pytest.raises(ValueError):
        fuse_scribbles(a, _payload(sequence="other"))


def test_scribbles2mask_default_matches_framework():
    from davisinteractive.utils.scribbles import scribbles2mask
    pay = _payload()
    got = scribbles2mask(pay, (24, 32))
    want = fw_scribbles.scribbles2mask(pay, (24, 32))
    np.testing.assert_array_equal(got, want)
    assert got.shape == (3, 24, 32)
    assert set(np.unique(got)) <= {-1, 0, 1, 2}


def test_scribbles2mask_points_only_subset_of_bresenham():
    from davisinteractive.utils.scribbles import scribbles2mask
    pay = _payload()
    full = scribbles2mask(pay, (24, 32))
    pts = scribbles2mask(pay, (24, 32), bresenham=False)
    # path endpoints only -> a (strict, for these long lines) subset
    assert np.count_nonzero(pts >= 0) < np.count_nonzero(full >= 0)
    assert np.all(full[pts >= 0] == pts[pts >= 0])


def test_scribbles2mask_bezier_covers_straight_line():
    from davisinteractive.utils.scribbles import scribbles2mask
    # Bézier through 2 control points IS the straight segment; with
    # enough samples it marks the same pixels as Bresenham
    pay = {"sequence": "s", "scribbles": [
        [{"path": [[0.1, 0.1], [0.8, 0.1]], "object_id": 1}]]}
    bez = scribbles2mask(pay, (24, 32), bezier_curve_sampling=True,
                         nb_points=2000)
    bre = scribbles2mask(pay, (24, 32))
    np.testing.assert_array_equal(bez, bre)


def test_scribbles2mask_only_annotated_frame_flag():
    from davisinteractive.utils.scribbles import scribbles2mask
    pay = _payload()
    m = scribbles2mask(pay, (24, 32), only_annotated_frame=True,
                       default_value=-7)
    assert np.all(m[1] == -7)
    assert np.count_nonzero(m[0] >= 0) > 0


def test_scribbles2points_scaling_and_ids():
    from davisinteractive.utils.scribbles import scribbles2points
    pay = _payload()
    x, y = scribbles2points(pay)
    assert x.shape == (len(y), 3) and len(y) == 2 + 2 + 2
    assert set(y.tolist()) == {0, 1, 2}
    assert x[:, 1:].min() >= 0.0 and x[:, 1:].max() <= 1.0
    xs, _ = scribbles2points(pay, output_resolution=(24, 32))
    assert xs[:, 1].max() <= 23 and xs[:, 2].max() <= 31
    assert np.allclose(xs, np.round(xs))        # pixel coordinates


def test_operations_bresenham_polyline_and_bezier():
    from davisinteractive.utils.operations import bezier_curve, bresenham
    line = bresenham(np.array([[0, 0], [3, 0], [3, 2]]))
    # junction pixel (3,0) appears exactly once
    assert (line == [3, 0]).all(axis=1).sum() == 1
    assert (line[0] == [0, 0]).all() and (line[-1] == [3, 2]).all()

    ctrl = np.array([[0.0, 0.0], [1.0, 2.0]])
    curve = bezier_curve(ctrl, nb_points=11)
    np.testing.assert_allclose(curve[0], ctrl[0])
    np.testing.assert_allclose(curve[-1], ctrl[1])
    # 2 control points -> exact straight segment
    np.testing.assert_allclose(curve[:, 1], 2.0 * curve[:, 0], atol=1e-12)


# -------------------------------------------------------------- metrics


def test_metrics_upstream_argument_order_and_inference():
    from davisinteractive.metrics import batched_f_measure, batched_jaccard
    rng = np.random.default_rng(0)
    gt = rng.integers(0, 3, size=(2, 16, 16)).astype(np.int32)
    pred = gt.copy()
    pred[:, :4] = 0
    # upstream order: (y_true, y_pred); nb_objects inferred from gt max
    j = batched_jaccard(gt, pred)
    f = batched_f_measure(gt, pred)
    np.testing.assert_allclose(j, fw_metrics.batched_jaccard(pred, gt, 2))
    np.testing.assert_allclose(f, fw_metrics.batched_f_measure(pred, gt, 2))
    # per-object output: (T, nb_objects), mean recovers the averaged form
    jo = batched_jaccard(gt, pred, average_over_objects=False)
    fo = batched_f_measure(gt, pred, average_over_objects=False)
    assert jo.shape == fo.shape == (2, 2)
    np.testing.assert_allclose(jo.mean(axis=1), j)
    np.testing.assert_allclose(fo.mean(axis=1), f)


# ---------------------------------------------------------------- robot


def test_robot_upstream_interact_returns_payload():
    from davisinteractive.robot import InteractiveScribblesRobot
    ds = SyntheticDataset(num_sequences=1, scribble_sets=1, num_frames=3)
    seq = ds.sequences()[0]
    gt = ds.gt_masks(seq)
    robot = InteractiveScribblesRobot(kernel_size=0.15, min_nb_nodes=3)
    # nb_objects omitted -> inferred from gt
    pay = robot.interact(seq, np.zeros_like(gt), gt)
    assert isinstance(pay, dict)
    assert pay["sequence"] == seq
    assert len(pay["scribbles"]) == gt.shape[0]
    frames = [i for i, l in enumerate(pay["scribbles"]) if l]
    assert len(frames) == 1
    for line in pay["scribbles"][frames[0]]:
        assert {"path", "object_id"} <= set(line)
    # frame pin
    pinned = robot.interact(seq, np.zeros_like(gt), gt, frame=1)
    assert [i for i, l in enumerate(pinned["scribbles"]) if l] == [1]


# -------------------------------------------------------------- session


def test_session_save_report_dir(tmp_path):
    """Upstream's save_report_dir: the report CSV lands on disk when the
    session closes."""
    import os

    import pandas as pd

    from davisinteractive.session import DavisInteractiveSession

    ds = SyntheticDataset(num_sequences=1, scribble_sets=1, num_frames=3)
    gt = ds.gt_masks(ds.sequences()[0])
    out = str(tmp_path / "reports")
    with DavisInteractiveSession(dataset=ds, max_nb_interactions=2,
                                 save_report_dir=out) as sess:
        while sess.next():
            sess.submit_masks(gt)
    path = os.path.join(out, "report.csv")
    assert os.path.exists(path)
    df = pd.read_csv(path)
    assert len(df) == len(sess.get_report())
    assert "jaccard" in df.columns


def test_session_shim_runs_upstream_style_loop():
    """The reference eval loop (SURVEY.md §4.1), written ONLY against
    `davisinteractive.*` imports."""
    from davisinteractive import __is_manet_tpu_shim__
    from davisinteractive.session import DavisInteractiveSession
    from davisinteractive.utils.scribbles import (
        annotated_frames, scribbles2mask)

    assert __is_manet_tpu_shim__
    ds = SyntheticDataset(num_sequences=1, scribble_sets=2, num_frames=3)
    gt = {s: ds.gt_masks(s) for s in ds.sequences()}
    seen_rounds = 0
    with DavisInteractiveSession(host="localhost", dataset=ds,
                                 max_nb_interactions=2) as sess:
        while sess.next():
            seq, scribbles, first = sess.get_scribbles(only_last=True)
            frames = annotated_frames(scribbles)
            assert len(frames) == 1
            h, w = gt[seq].shape[1:]
            scr_mask = scribbles2mask(scribbles, (h, w))
            assert scr_mask.shape == gt[seq].shape
            assert np.count_nonzero(scr_mask[frames[0]] >= 0) > 0
            sess.submit_masks(gt[seq] if not first
                              else np.zeros_like(gt[seq]))
            seen_rounds += 1
    assert seen_rounds == 2 * 2                 # 2 sets x 2 rounds
    report = sess.get_report()
    assert {"sequence", "interaction", "jaccard", "contour",
            "timing"} <= set(report.columns)
    summary = sess.get_global_summary(max_time=10.0, at_threshold=5.0)
    assert 0.0 < summary["auc"] <= 1.0


def test_dataset_davis_over_tree(davis_root):
    """`davisinteractive.dataset.Davis` surface over a DAVIS tree."""
    from davisinteractive.dataset import Davis

    davis = Davis(davis_root)
    assert davis.sets["val"] == ["seq_a", "seq_b"]
    davis.check_files(["seq_a"])
    meta = davis.sequence_metadata("seq_a")
    assert meta == {"num_frames": 4, "num_scribbles": 3,
                    "num_objects": 2, "image_size": (96, 64)}
    assert davis.dataset["seq_b"]["num_frames"] == 4
    scr = davis.load_scribble("seq_a", 1)       # 1-based upstream index
    assert scr["sequence"] == "seq_a" and len(scr["scribbles"]) == 4
    ann = davis.load_annotations("seq_a")
    assert ann.shape == (4, 64, 96) and ann.max() == 2
    imgs = davis.load_images("seq_a")
    assert imgs.shape == (4, 64, 96, 3) and imgs.dtype == np.uint8


def test_dataset_davis_requires_root(monkeypatch):
    from davisinteractive.dataset import Davis
    monkeypatch.delenv("DATASET_DAVIS", raising=False)
    with pytest.raises(ValueError, match="root dir"):
        Davis()


def test_dataset_davis_check_files_raises(davis_root):
    from davisinteractive.dataset import Davis
    with pytest.raises(FileNotFoundError, match="no_such_seq"):
        Davis(davis_root).check_files(["no_such_seq"])


def test_local_storage_roundtrip():
    from davisinteractive.storage import AbstractStorage, LocalStorage

    st = LocalStorage()
    assert isinstance(st, AbstractStorage)
    st.store_interactions_results(
        "user", "sess1", "seq_a", 1, 1, 2.5,
        objects_idx=[1, 1, 2, 2], frames_idx=[0, 1, 0, 1],
        jaccard=[0.5, 0.6, 0.7, 0.8], contour=[0.4, 0.5, 0.6, 0.7])
    st.store_interactions_results(
        "user", "sess1", "seq_a", 1, 2, 1.5,
        objects_idx=[1, 2], frames_idx=[0, 0],
        jaccard=[0.9, 0.95], contour=[0.9, 0.9])
    df = st.get_report("sess1")
    assert list(df.columns) == AbstractStorage.COLUMNS
    assert len(df) == 6
    assert sorted(df["interaction"].unique()) == [1, 2]
    assert st.get_annotated_frames("sess1", "seq_a", 1) == [0, 1]
    assert st.get_report("other").empty


def test_local_storage_validates():
    from davisinteractive.storage import LocalStorage

    st = LocalStorage()
    with pytest.raises(ValueError, match="same length"):
        st.store_interactions_results("u", "s", "q", 1, 1, 0.0,
                                      [1], [0, 1], [0.5], [0.5])
    with pytest.raises(ValueError, match="jaccard"):
        st.store_interactions_results("u", "s", "q", 1, 1, 0.0,
                                      [1], [0], [1.5], [0.5])
    with pytest.raises(ValueError, match="out of order"):
        st.store_interactions_results("u", "s", "q", 1, 2, 0.0,
                                      [1], [0], [0.5], [0.5])
    with pytest.raises(ValueError, match="jaccard"):   # NaN fails loudly
        st.store_interactions_results("u", "s", "q", 1, 1, 0.0,
                                      [1], [0], [float("nan")], [0.5])


def test_logging_shim(caplog):
    import logging as stdlib_logging

    from davisinteractive import logging as dlog

    dlog.set_info_level()
    with caplog.at_level(stdlib_logging.INFO, logger="davisinteractive"):
        dlog.info("hello %s", "world")
        dlog.warning("careful")
    msgs = [r.getMessage() for r in caplog.records]
    assert "hello world" in msgs and "careful" in msgs


def test_draw_scribble_image_space():
    from davisinteractive.utils.visualization import draw_scribble

    payload = _payload(frames=2)
    img = np.zeros((40, 60, 3), np.uint8)
    out = draw_scribble(img, payload, 0, width=3)
    assert out.shape == img.shape and out.dtype == np.uint8
    assert (out != 0).any()                      # strokes drawn
    assert (img == 0).all()                      # input untouched
    out2 = draw_scribble(img, payload, 0, output_size=(80, 120))
    assert out2.shape == (80, 120, 3)
    empty = draw_scribble(img, payload, 1)       # frame without strokes
    assert (empty == 0).all()


def test_reference_style_eval_script(tmp_path, capsys):
    """The migrated reference eval script (scripts/reference_style_eval.py)
    runs the upstream loop end-to-end against the real Evaluator."""
    import json

    from scripts.reference_style_eval import main

    report = str(tmp_path / "report.csv")
    main(["--synthetic", "--rounds", "2", "--report", report])
    out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert set(out) == {"auc", "jf_at_60s", "rows"}
    assert out["rows"] > 0
    import pandas as pd
    df = pd.read_csv(report)
    assert len(df) == out["rows"]
