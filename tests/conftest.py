"""Test harness: run everything on a virtual 8-device CPU mesh.

Must set XLA flags BEFORE jax initializes (SURVEY.md §5d: the standard JAX
fake-multihost trick for testing sharding without TPU hardware).
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402
import numpy as np  # noqa: E402
import pytest  # noqa: E402

# The sandbox's sitecustomize force-registers the remote "axon" TPU backend
# via jax.config (overriding the JAX_PLATFORMS env var) — pin CPU here or
# every test silently tunnels to the TPU.
jax.config.update("jax_platforms", "cpu")

# Persistent compilation cache: model-graph compiles dominate test runtime
# on the CPU backend; cache them across pytest invocations.
jax.config.update("jax_compilation_cache_dir", "/tmp/jax_test_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)


@pytest.fixture
def rng():
    return np.random.default_rng(0)


@pytest.fixture
def davis_root(tmp_path):
    """Synthetic on-disk DAVIS tree (2 sequences, 4 frames, 2 objects,
    3 scribble sets) — shared by the adapter, CLI, and shim tests."""
    import json

    from PIL import Image

    from cvpr2020_manet_tpu.utils.colormap import davis_palette

    root = tmp_path / "DAVIS"
    seqs = ["seq_a", "seq_b"]
    h, w, t = 64, 96, 4
    rng = np.random.default_rng(0)
    for seq in seqs:
        (root / "JPEGImages" / "480p" / seq).mkdir(parents=True)
        (root / "Annotations" / "480p" / seq).mkdir(parents=True)
        (root / "Scribbles" / seq).mkdir(parents=True)
        for f in range(t):
            img = (rng.random((h, w, 3)) * 255).astype(np.uint8)
            Image.fromarray(img).save(
                root / "JPEGImages" / "480p" / seq / f"{f:05d}.jpg")
            mask = np.zeros((h, w), np.uint8)
            mask[10:30, 10 + 2 * f:40 + 2 * f] = 1
            mask[40:60, 50:80] = 2
            m = Image.fromarray(mask, mode="P")
            m.putpalette(davis_palette().reshape(-1).tolist())
            m.save(root / "Annotations" / "480p" / seq / f"{f:05d}.png")
        for s in range(1, 4):
            payload = {"sequence": seq, "scribbles": [
                [{"path": [[0.2, 0.3], [0.5, 0.4]], "object_id": 1}]
                if f == 0 else [] for f in range(t)]}
            with open(root / "Scribbles" / seq / f"{s:03d}.json", "w") as fp:
                json.dump(payload, fp)
    (root / "ImageSets" / "2017").mkdir(parents=True)
    (root / "ImageSets" / "2017" / "val.txt").write_text("seq_a\nseq_b\n")
    (root / "ImageSets" / "2017" / "train.txt").write_text("seq_a\nseq_b\n")
    return str(root)
