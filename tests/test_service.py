"""Remote evaluation service (interactive/service.py): the HTTP
server/client pair must reproduce the local `InteractiveSession`
protocol and scores exactly (SURVEY.md C20 — upstream davisinteractive's
remote mode, `session.DavisInteractiveSession(host='https://...')`)."""

import numpy as np
import pytest

from cvpr2020_manet_tpu.data.synthetic import SyntheticDataset
from cvpr2020_manet_tpu.interactive.service import RemoteSession, serve
from cvpr2020_manet_tpu.interactive.session import (
    DavisInteractiveSession, InteractiveSession)


@pytest.fixture
def server():
    ds = SyntheticDataset(num_sequences=2, scribble_sets=2, num_frames=3)
    srv, thread = serve(ds, port=0)
    yield srv, ds
    srv.shutdown()


def _degraded(gt: np.ndarray, t_keep: int = 0) -> np.ndarray:
    """A deterministic scribble-independent 'prediction': ground truth on
    frame t_keep, background elsewhere — leaves the robot real errors to
    scribble on every round."""
    pred = np.zeros_like(gt)
    pred[t_keep] = gt[t_keep]
    return pred


def _run(session, ds, rounds_log=None):
    with session as sess:
        while sess.next():
            seq, scribbles, first = sess.get_scribbles()
            assert scribbles["sequence"] == seq
            if rounds_log is not None:
                rounds_log.append((seq, first))
            sess.submit_masks(_degraded(ds.gt_masks(seq)))
        report = sess.get_report()
        summary = sess.get_global_summary()
    return report, summary


def test_remote_session_full_protocol(server):
    srv, ds = server
    port = srv.server_address[1]
    log = []
    report, summary = _run(
        RemoteSession(f"http://127.0.0.1:{port}", max_nb_interactions=3),
        ds, log)
    # 2 sequences x 2 sets, up to 3 rounds each (the robot may end an
    # item early when it finds nothing to correct); round 0 of each item
    # is flagged first_scribble
    assert 4 <= len(log) <= 12
    assert sum(first for _, first in log) == 4
    assert not report.empty
    assert 0.0 < summary["auc"] <= 1.0
    assert summary["curve"] is not None and len(summary["curve"][0]) == 481


def test_remote_matches_local_scores(server):
    """Same dataset + deterministic predictor -> identical per-row J/F in
    the remote and local reports (timing columns differ: wall clock)."""
    srv, ds = server
    port = srv.server_address[1]
    remote_report, _ = _run(
        RemoteSession(f"http://127.0.0.1:{port}", max_nb_interactions=3), ds)
    local_report, _ = _run(
        InteractiveSession(ds, max_interactions=3), ds)
    score_cols = ["sequence", "scribble_idx", "interaction", "object_id",
                  "frame", "jaccard", "contour"]
    lhs = remote_report[score_cols].reset_index(drop=True)
    rhs = local_report[score_cols].reset_index(drop=True)
    assert lhs.equals(rhs)


def test_davis_session_http_host_returns_remote(server):
    srv, _ = server
    port = srv.server_address[1]
    sess = DavisInteractiveSession(host=f"http://127.0.0.1:{port}",
                                   max_nb_interactions=2)
    assert isinstance(sess, RemoteSession)
    with sess:
        assert sess.next()
        seq, scribbles, first = sess.get_scribbles(only_last=True)
        assert first and scribbles["scribbles"]


def test_run_session_drives_remote_like_local(server):
    """`Evaluator.run_session` (the production model loop) over a
    RemoteSession produces the same scores as over the local session —
    the client side never touches ground truth (dataset view has none)."""
    from cvpr2020_manet_tpu.config import tiny_test_config
    from cvpr2020_manet_tpu.engine.eval_davis import build_evaluator

    srv, ds = server
    port = srv.server_address[1]
    cfg = tiny_test_config()
    evaluator = build_evaluator(cfg)

    remote = RemoteSession(f"http://127.0.0.1:{port}",
                           max_nb_interactions=2, images=ds)
    assert not hasattr(remote.dataset, "gt_masks")
    s_remote = evaluator.run_session(remote)

    local_sess = InteractiveSession(ds, max_interactions=2)
    s_local = build_evaluator(cfg).run_session(local_sess)
    # scores must match row-for-row (model + robot are deterministic)
    score_cols = ["sequence", "scribble_idx", "interaction", "object_id",
                  "frame", "jaccard", "contour"]
    assert remote.get_report()[score_cols].reset_index(drop=True).equals(
        local_sess.get_report()[score_cols].reset_index(drop=True))
    # AUC integrates over the TIME axis — wall clocks differ (HTTP round
    # trips land on the curve), so curve-derived numbers are close, not
    # equal; the per-row scores above are the exact-parity pin.
    assert np.isclose(s_remote["auc"], s_local["auc"], atol=0.01)
    assert np.isclose(s_remote["metric_at_threshold"],
                      s_local["metric_at_threshold"], atol=0.01)
    # explicit close frees the server session
    remote.close()
    with pytest.raises(RuntimeError, match="404"):
        remote.get_report()


def test_eval_davis_cli_remote_host(davis_root):  # noqa: F811
    """`eval_davis --host http://...` drives the full CLI against a
    served DAVIS tree."""
    import json

    from cvpr2020_manet_tpu.data.davis import DavisEvalDataset
    from cvpr2020_manet_tpu.engine.eval_davis import main

    ds = DavisEvalDataset(davis_root, subset="train", scribble_sets=1)
    srv, _ = serve(ds)
    try:
        url = f"http://127.0.0.1:{srv.server_address[1]}"
        main(["--davis_root", davis_root, "--subset", "train", "--tiny",
              "--rounds", "2", "--scribble_sets", "1", "--host", url])
    finally:
        srv.shutdown()


def test_session_registry_bounded():
    """The server evicts the oldest session past max_sessions (a
    long-running evaluation server must not grow without bound)."""
    from cvpr2020_manet_tpu.interactive.service import EvaluationService

    ds = SyntheticDataset(num_sequences=1, scribble_sets=1, num_frames=2)
    svc = EvaluationService(ds, max_sessions=3)
    sids = [svc.start_session() for _ in range(5)]
    assert len(svc._sessions) == 3
    for sid in sids[:2]:                      # oldest two evicted
        with pytest.raises(KeyError):
            svc.get(sid)
    svc.get(sids[-1])


def test_concurrent_sessions_and_dataset_info(server):
    """ThreadingHTTPServer: concurrent clients run full protocols in
    parallel sessions (per-session locks) and racing first
    /api/dataset requests all get the same cached metadata
    (dataset_info's lock)."""
    import threading

    srv, ds = server
    port = srv.server_address[1]
    infos, errors = [], []

    def client():
        try:
            sess = RemoteSession(f"http://127.0.0.1:{port}",
                                 max_nb_interactions=2)
            infos.append(sess.dataset._meta())
            rows = []
            _run(sess, ds, rows)
            assert len(rows) > 0
            infos.append(len(sess.get_report()))
        except Exception as e:  # surfaces in the main thread
            errors.append(e)

    threads = [threading.Thread(target=client) for _ in range(4)]
    for t in threads:
        t.start()
    for t in threads:
        t.join(timeout=120)
    assert not errors, errors
    metas = [i for i in infos if isinstance(i, dict)]
    counts = [i for i in infos if isinstance(i, int)]
    assert len(metas) == len(counts) == 4
    assert all(m == metas[0] for m in metas)
    assert all(c == counts[0] and c > 0 for c in counts)


def test_remote_errors_surface(server):
    srv, ds = server
    port = srv.server_address[1]
    sess = RemoteSession(f"http://127.0.0.1:{port}")
    # submit before next() -> server-side protocol error -> client raises
    with pytest.raises(RuntimeError, match="RuntimeError"):
        sess.submit_masks(np.zeros((3, 32, 48), np.uint8))
    # unknown session id -> 404
    bad = RemoteSession.__new__(RemoteSession)
    bad.host, bad.timeout, bad.session_id = sess.host, 5.0, "deadbeef"
    with pytest.raises(RuntimeError, match="404"):
        bad.next()


def test_eviction_prefers_finished_sessions():
    """Registry eviction: a FINISHED session is evicted before a live one
    (FIFO used to kill live clients mid-protocol)."""
    from cvpr2020_manet_tpu.interactive.service import EvaluationService

    ds = SyntheticDataset(num_sequences=1, scribble_sets=1, num_frames=3)
    svc = EvaluationService(ds, max_sessions=2)
    done = svc.start_session(max_nb_interactions=1)
    sess, _ = svc.get(done)
    while sess.next():
        sess.submit_masks(ds.gt_masks(ds.sequences()[0]))
    assert sess.finished
    live = svc.start_session(max_nb_interactions=8)
    svc.get(live)[0].next()                      # live session, mid-item
    third = svc.start_session(max_nb_interactions=8)
    # the finished session went; the live one survived
    with pytest.raises(KeyError):
        svc.get(done)
    svc.get(live)
    svc.get(third)


def test_masks_endpoint_rejects_bomb_and_bad_shape(server):
    """Bounded decompress: a payload that decompresses past X-Shape (a
    zlib bomb) is rejected without materializing it; absurd X-Shape too."""
    import json
    import urllib.request
    import zlib

    srv, ds = server
    port = srv.server_address[1]
    base = f"http://127.0.0.1:{port}"

    def post(path, data=b"", headers=None):
        req = urllib.request.Request(base + path, data=data,
                                     headers=headers or {}, method="POST")
        try:
            with urllib.request.urlopen(req) as r:
                return r.status, json.loads(r.read())
        except urllib.error.HTTPError as e:
            return e.code, json.loads(e.read())

    sid = post("/api/session")[1]["session_id"]
    post(f"/api/session/{sid}/next")

    # 1 MB of zeros decompressing far past the declared 3x4x4 shape
    bomb = zlib.compress(b"\0" * (1 << 20), level=9)
    code, body = post(f"/api/session/{sid}/masks", bomb,
                      {"X-Shape": "3,4,4"})
    assert code == 400 and "decompress" in body["error"]

    code, body = post(f"/api/session/{sid}/masks", zlib.compress(b"\0"),
                      {"X-Shape": "100000,10000,10000"})
    assert code == 400 and "out of bounds" in body["error"]
