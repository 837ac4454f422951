"""AOT serving artifacts (utils/export.py): round-trip + manifest checks."""

import json

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from cvpr2020_manet_tpu.config import tiny_test_config
from cvpr2020_manet_tpu.models import MANet
from cvpr2020_manet_tpu.utils import export as ex


@pytest.fixture(scope="module")
def model_and_vars():
    cfg = tiny_test_config()
    h, w = cfg.eval.image_size
    o = cfg.model.max_objects + 1
    model = MANet(cfg.model, matching_backend="jnp")
    variables = jax.jit(model.init)(
        jax.random.PRNGKey(0), jnp.zeros((1, h, w, 3)),
        jnp.zeros((1, h // 4, w // 4, o)), jnp.zeros((1, h // 4, w // 4, o)))
    return cfg, model, variables


def test_roundtrip_matches_direct_apply(model_and_vars, tmp_path):
    cfg, model, variables = model_and_vars
    size = cfg.eval.image_size
    exported = ex.export_forward(model, variables, size,
                                 cfg.model.max_objects,
                                 platforms=("cpu",), pad_to=cfg.eval.pad_to)
    path = str(tmp_path / "m.ivosx")
    manifest = ex.save_artifact(exported, path, extra={"image_size": size})
    loaded = ex.load_artifact(path)
    assert loaded.manifest == manifest

    fn, example_args = ex.build_round_forward(
        model, variables, size, cfg.model.max_objects, pad_to=cfg.eval.pad_to)
    rng = np.random.default_rng(1)
    args = [jnp.asarray(rng.standard_normal(a.shape), a.dtype)
            for a in example_args]
    got = np.asarray(loaded(*args))
    want = np.asarray(jax.jit(fn)(*args))
    np.testing.assert_allclose(got, want, atol=1e-5)
    # probabilities: rows sum to 1
    np.testing.assert_allclose(got.sum(-1), 1.0, atol=1e-4)


def test_manifest_fields(model_and_vars, tmp_path):
    cfg, model, variables = model_and_vars
    exported = ex.export_forward(model, variables, cfg.eval.image_size,
                                 cfg.model.max_objects,
                                 platforms=("cpu",), pad_to=cfg.eval.pad_to)
    path = str(tmp_path / "m.ivosx")
    manifest = ex.save_artifact(exported, path)
    assert manifest["format"] == ex.FORMAT
    assert manifest["platforms"] == ["cpu"]
    assert manifest["jax_version"] == jax.__version__
    h, w = cfg.eval.image_size
    o = cfg.model.max_objects + 1
    assert manifest["in_avals"][0] == [[h, w, 3], "float32"]
    assert manifest["out_avals"][0] == [[h // 4, w // 4, o], "float32"]


def test_load_rejects_bad_magic(tmp_path):
    path = str(tmp_path / "bad.ivosx")
    with open(path, "wb") as f:
        f.write(b"NOTANARTIFACT")
    with pytest.raises(ValueError, match="bad magic"):
        ex.load_artifact(path)


def test_load_rejects_corrupt_manifest(tmp_path):
    path = str(tmp_path / "bad.ivosx")
    with open(path, "wb") as f:
        f.write(b"IVOSX1\n{not json\n")
    with pytest.raises(ValueError, match="corrupt manifest"):
        ex.load_artifact(path)


def test_load_rejects_corrupt_blob(model_and_vars, tmp_path):
    cfg, model, variables = model_and_vars
    exported = ex.export_forward(model, variables, cfg.eval.image_size,
                                 cfg.model.max_objects,
                                 platforms=("cpu",), pad_to=cfg.eval.pad_to)
    path = str(tmp_path / "m.ivosx")
    ex.save_artifact(exported, path)
    data = open(path, "rb").read()
    with open(path, "wb") as f:
        f.write(data[: len(data) // 2])  # truncate the blob
    with pytest.raises(ValueError, match="corrupt export blob"):
        ex.load_artifact(path)


def test_wrong_shape_call_raises(model_and_vars, tmp_path):
    cfg, model, variables = model_and_vars
    exported = ex.export_forward(model, variables, cfg.eval.image_size,
                                 cfg.model.max_objects,
                                 platforms=("cpu",), pad_to=cfg.eval.pad_to)
    path = str(tmp_path / "m.ivosx")
    ex.save_artifact(exported, path)
    loaded = ex.load_artifact(path)
    h, w = cfg.eval.image_size
    o = cfg.model.max_objects + 1
    with pytest.raises(ValueError):
        loaded(jnp.zeros((h + 4, w, 3)),
               jnp.zeros((h // 4, w // 4, o)), jnp.zeros((h // 4, w // 4, o)))


def test_tpu_cross_lowering_embeds_pallas(tmp_path):
    """A TPU artifact — production Pallas matching kernels included — can
    be lowered + serialized from a CPU-only build machine (the real
    deployment flow: build host has no chip, serving fleet does)."""
    cfg = tiny_test_config()
    h, w = cfg.eval.image_size
    o = cfg.model.max_objects + 1
    model = MANet(cfg.model, matching_backend="pallas")
    variables = jax.jit(model.init)(
        jax.random.PRNGKey(0), jnp.zeros((1, h, w, 3)),
        jnp.zeros((1, h // 4, w // 4, o)), jnp.zeros((1, h // 4, w // 4, o)))
    exported = ex.export_forward(model, variables, (h, w),
                                 cfg.model.max_objects,
                                 platforms=("tpu",), pad_to=cfg.eval.pad_to)
    assert exported.platforms == ("tpu",)
    assert "tpu_custom_call" in exported.mlir_module()
    path = str(tmp_path / "tpu.ivosx")
    manifest = ex.save_artifact(exported, path)
    assert manifest["platforms"] == ["tpu"]
    # loads (deserializes) fine on this CPU-only host; execution needs a TPU
    loaded = ex.load_artifact(path)
    assert loaded.manifest["platforms"] == ["tpu"]


def test_cli_export_and_check(tmp_path, capsys):
    from scripts.export_model import main
    out = str(tmp_path / "cli.ivosx")
    main(["--out", out, "--tiny", "--check",
          "--platforms", "cpu", "--matching_backend", "jnp"])
    lines = capsys.readouterr().out.strip().splitlines()
    manifest = json.loads(lines[0])
    assert manifest["format"] == ex.FORMAT
    assert "matches direct apply" in lines[-1]
