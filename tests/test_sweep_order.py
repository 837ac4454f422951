"""Contract tests for the evaluator's (T-1)-step sweep ordering and for
session determinism."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest


def sweep_order(t, annot):
    """Replicates engine/evaluator._round_impl's visit-order formula."""
    idx = np.arange(t - 1)
    fwd_len = t - 1 - annot
    frame = np.where(idx < fwd_len, annot + 1 + idx,
                     annot - 1 - (idx - fwd_len))
    prev = np.where(idx < fwd_len, frame - 1, frame + 1)
    reset = idx == fwd_len
    return frame, prev, reset


@pytest.mark.parametrize("t,annot", [(6, 2), (6, 0), (6, 5), (4, 1), (2, 0)])
def test_sweep_visits_every_frame_once_in_chain_order(t, annot):
    frame, prev, reset = sweep_order(t, annot)
    # every non-annotated frame visited exactly once
    assert sorted(frame) == [i for i in range(t) if i != annot]
    # forward chain: each step's prev is the previously visited frame (or
    # the annotated frame at a sweep start)
    visited = {annot}
    for f, p, r in zip(frame, prev, reset):
        assert p in visited, (f, p)
        if r:
            assert p == annot
        visited.add(f)
    # first step always starts at the annotated frame
    assert prev[0] == annot


def test_session_is_deterministic():
    from cvpr2020_manet_tpu.config import tiny_test_config
    from cvpr2020_manet_tpu.data import SyntheticDataset
    from cvpr2020_manet_tpu.engine.evaluator import Evaluator
    from cvpr2020_manet_tpu.interactive.session import InteractiveSession
    from cvpr2020_manet_tpu.models import MANet

    cfg = tiny_test_config()
    ds = SyntheticDataset(image_size=cfg.eval.image_size,
                          num_frames=cfg.eval.max_frames,
                          num_sequences=1, num_objects=1, scribble_sets=1)
    model = MANet(cfg.model, matching_backend="jnp")
    h, w = cfg.eval.image_size
    o = cfg.model.max_objects + 1
    variables = jax.jit(model.init)(
        jax.random.PRNGKey(0), jnp.zeros((1, h, w, 3)),
        jnp.zeros((1, h // 4, w // 4, o)), jnp.zeros((1, h // 4, w // 4, o)))

    reports = []
    for _ in range(2):
        ev = Evaluator(cfg, model, variables)
        sess = InteractiveSession(ds, max_interactions=2)
        ev.run_session(sess)
        reports.append(sess.get_report()[
            ["sequence", "interaction", "frame", "jaccard", "contour"]])
    assert reports[0].equals(reports[1])
