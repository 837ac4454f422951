"""Release-checkpoint round trip through the eval CLI (--checkpoint) and
LatencyHistogram summary."""

import json

import jax
import jax.numpy as jnp
import numpy as np

from cvpr2020_manet_tpu.config import tiny_test_config
from cvpr2020_manet_tpu.models import MANet
from cvpr2020_manet_tpu.utils.checkpoint import export_release
from cvpr2020_manet_tpu.utils.profiling import LatencyHistogram


def test_eval_cli_loads_release_checkpoint(davis_root, tmp_path, capsys):  # noqa: F811
    cfg = tiny_test_config()
    model = MANet(cfg.model, matching_backend="jnp")
    h, w = 64, 96
    o = cfg.model.max_objects + 1
    variables = jax.jit(model.init)(
        jax.random.PRNGKey(7), jnp.zeros((1, h, w, 3)),
        jnp.zeros((1, h // 4, w // 4, o)), jnp.zeros((1, h // 4, w // 4, o)))
    release = str(tmp_path / "release")
    export_release(variables["params"], release)

    from cvpr2020_manet_tpu.engine.eval_davis import main
    main(["--davis_root", davis_root, "--subset", "val", "--rounds", "1",
          "--scribble_sets", "1", "--max_frames", "4",
          "--image_size", "64", "96", "--tiny", "--checkpoint", release])
    out = capsys.readouterr().out.strip().splitlines()[-1]
    summary = json.loads(out)
    assert 0.0 <= summary["auc"] <= 1.0
    assert summary["rounds_run"] >= 1


def test_latency_histogram():
    hist = LatencyHistogram()
    for v in [0.1, 0.2, 0.3, 0.4, 1.0]:
        hist.add(v)
    s = hist.summary()
    assert s["count"] == 5
    assert s["p50"] == 0.3
    assert s["max"] == 1.0
    assert LatencyHistogram().summary() == {}
