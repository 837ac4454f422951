"""Batched multi-sequence propagation (BASELINE config 4)."""

import jax
import jax.numpy as jnp
import numpy as np

from cvpr2020_manet_tpu.config import tiny_test_config
from cvpr2020_manet_tpu.data import SyntheticDataset
from cvpr2020_manet_tpu.engine.propagate_batch import (
    BatchPropagator, preprocess_frames)
from cvpr2020_manet_tpu.models import MANet


def test_preprocess_frames_matches_host_normalize():
    from cvpr2020_manet_tpu.data.davis import normalize_image
    u8 = np.random.default_rng(0).integers(0, 256, size=(2, 4, 4, 3),
                                           dtype=np.uint8)
    dev = np.asarray(preprocess_frames(jnp.asarray(u8)))
    host = normalize_image(u8.astype(np.float32) / 255.0)
    np.testing.assert_allclose(dev, host, rtol=1e-6)


def test_batch_propagation_shapes_and_seed_frame():
    cfg = tiny_test_config()
    h, w = cfg.eval.image_size
    o = cfg.model.max_objects + 1
    b, t = 2, 3
    model = MANet(cfg.model, matching_backend="jnp")
    variables = jax.jit(model.init)(
        jax.random.PRNGKey(0), jnp.zeros((1, h, w, 3)),
        jnp.zeros((1, h // 4, w // 4, o)), jnp.zeros((1, h // 4, w // 4, o)))
    prop = BatchPropagator(cfg, model, variables)

    frames = np.zeros((b, t, h, w, 3), np.uint8)
    gts = []
    for i in range(b):
        ds = SyntheticDataset(image_size=(h, w), num_frames=t,
                              num_sequences=1, num_objects=2, seed=i)
        seq = ds.sequences()[0]
        frames[i] = (np.clip(ds.images(seq), 0, 1) * 255).astype(np.uint8)
        gts.append(ds.gt_masks(seq))
    first = np.stack([g[0, ::4, ::4] for g in gts]).astype(np.int32)

    out = prop.propagate(frames, first, np.array([2, 2]))
    assert out.shape == (b, t, h, w)
    assert out.min() >= 0 and out.max() <= cfg.model.max_objects
    # frame 0 reproduces the seeded mask (upsampled)
    seed_up = np.repeat(np.repeat(first, 4, axis=1), 4, axis=2)
    agree = (out[:, 0] == seed_up).mean()
    assert agree > 0.95


def test_propagate_cli_prints_metric(capsys):
    """Throughput CLI (BASELINE config 4) emits one JSON metric line."""
    import json

    from cvpr2020_manet_tpu.engine.propagate_batch import main
    main(["--tiny", "--dataset", "synthetic", "--batch", "2",
          "--frames", "4", "--timed_batches", "1"])
    line = capsys.readouterr().out.strip().splitlines()[-1]
    rec = json.loads(line)
    assert rec["metric"] == "batched_propagation_fps"
    assert rec["value"] > 0
    assert rec["batch"] == 2 and rec["frames"] == 4
