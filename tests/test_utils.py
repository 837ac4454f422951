"""Checkpoint round-trip, colormap, meters."""

import numpy as np
import jax
import jax.numpy as jnp

from cvpr2020_manet_tpu.config import tiny_test_config
from cvpr2020_manet_tpu.engine.train_state import TrainState
from cvpr2020_manet_tpu.utils.checkpoint import (
    CheckpointManager, export_release, load_release)
from cvpr2020_manet_tpu.utils.colormap import (
    davis_palette, load_indexed_png, save_indexed_png)
from cvpr2020_manet_tpu.utils.meters import AverageMeter


def test_palette_known_entries():
    p = davis_palette()
    assert p.shape == (256, 3)
    np.testing.assert_array_equal(p[0], [0, 0, 0])          # background
    np.testing.assert_array_equal(p[1], [128, 0, 0])        # object 1
    np.testing.assert_array_equal(p[2], [0, 128, 0])        # object 2


def test_indexed_png_roundtrip(tmp_path):
    mask = np.random.default_rng(0).integers(0, 4, size=(20, 30))
    path = str(tmp_path / "m.png")
    save_indexed_png(path, mask)
    back = load_indexed_png(path)
    np.testing.assert_array_equal(back, mask)


def test_average_meter():
    m = AverageMeter()
    m.update(1.0)
    m.update(3.0)
    assert m.avg == 2.0
    m.update(10.0, n=2)
    assert m.avg == (1 + 3 + 20) / 4


def test_checkpoint_roundtrip(tmp_path):
    cfg = tiny_test_config()
    params = {"encoder": {"backbone": {"w": jnp.arange(4.0)}},
              "head": {"b": jnp.ones((2, 2))}}
    state = TrainState.create(params, cfg.train)
    state = state.replace(step=jnp.asarray(7, jnp.int32))
    mgr = CheckpointManager(str(tmp_path / "ckpts"))
    mgr.save(state)
    assert mgr.latest_step() == 7

    fresh = TrainState.create(
        jax.tree.map(jnp.zeros_like, params), cfg.train)
    restored = mgr.restore(fresh)
    assert int(restored.step) == 7
    np.testing.assert_array_equal(
        np.asarray(restored.params["encoder"]["backbone"]["w"]),
        np.arange(4.0))

    export_release(state.params, str(tmp_path / "release"))
    rel = load_release(jax.tree.map(jnp.zeros_like, params),
                       str(tmp_path / "release"))
    np.testing.assert_array_equal(np.asarray(rel["head"]["b"]),
                                  np.ones((2, 2)))


def test_metric_logger_stdout_and_tensorboard(tmp_path, capsys):
    """MetricLogger: stdout fallback without a log_dir; clu TensorBoard
    event files when one is given (SURVEY.md §6 metrics/logging row)."""
    from cvpr2020_manet_tpu.utils.logging import MetricLogger

    lg = MetricLogger(None)
    lg.write(3, {"loss": 1.25, "lr": 0.5})
    lg.flush()
    out = capsys.readouterr().out
    assert "step 3" in out and "loss=1.2500" in out

    d = tmp_path / "tb"
    lg2 = MetricLogger(str(d))
    lg2.write(1, {"loss": 0.5})
    lg2.flush()
    if lg2._writer is not None:      # clu available in this environment
        files = list(d.rglob("*"))
        assert files, "writer created no event files"


def test_model_config_rejects_non4_feature_stride():
    import dataclasses

    import pytest

    from cvpr2020_manet_tpu.config import ModelConfig
    with pytest.raises(ValueError, match="stride-4"):
        dataclasses.replace(ModelConfig(), feature_stride=8)
