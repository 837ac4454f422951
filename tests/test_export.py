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
                                 platforms=("cpu",), pad_to=cfg.eval.pad_to,
                                 raw_image=False)
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
                                 platforms=("cpu",), pad_to=cfg.eval.pad_to,
                                 raw_image=False)
    path = str(tmp_path / "m.ivosx")
    manifest = ex.save_artifact(exported, path)
    assert manifest["format"] == ex.FORMAT
    assert manifest["platforms"] == ["cpu"]
    assert manifest["jax_version"] == jax.__version__
    h, w = cfg.eval.image_size
    o = cfg.model.max_objects + 1
    assert manifest["in_avals"][0] == [[h, w, 3], "float32"]
    assert manifest["out_avals"][0] == [[h // 4, w // 4, o], "float32"]


def test_extra_cannot_clobber_reserved_keys(model_and_vars, tmp_path):
    cfg, model, variables = model_and_vars
    exported = ex.export_forward(model, variables, cfg.eval.image_size,
                                 cfg.model.max_objects,
                                 platforms=("cpu",), pad_to=cfg.eval.pad_to)
    with pytest.raises(ValueError, match="reserved"):
        ex.save_artifact(exported, str(tmp_path / "m.ivosx"),
                         extra={"format": "evil"})
    exports = {"extract": exported}
    with pytest.raises(ValueError, match="reserved"):
        ex.save_bundle(exports, str(tmp_path / "b.ivosx"),
                       extra={"entries": {}})


def test_nonaligned_size_pads_to_pad_to(model_and_vars):
    """Spatial contract: grid = (H + (-H) % pad_to) // 4 per side."""
    cfg, model, variables = model_and_vars
    fn, example_args = ex.build_round_forward(
        model, variables, (30, 50), cfg.model.max_objects,
        pad_to=cfg.eval.pad_to)
    assert example_args[0].shape == (30, 50, 3)
    assert example_args[1].shape == (8, 16, cfg.model.max_objects + 1)
    out = jax.jit(fn)(*example_args)
    assert out.shape == (8, 16, cfg.model.max_objects + 1)


def test_raw_image_artifact_matches_normalized_float(model_and_vars,
                                                     tmp_path):
    """Default (raw uint8) artifact == float artifact fed the normalized
    version of the same frame — the normalize transform lives INSIDE."""
    from cvpr2020_manet_tpu.data.davis import normalize_image

    cfg, model, variables = model_and_vars
    size = cfg.eval.image_size
    o = cfg.model.max_objects + 1
    exported = ex.export_forward(model, variables, size,
                                 cfg.model.max_objects,
                                 platforms=("cpu",), pad_to=cfg.eval.pad_to)
    h, w = size
    assert exported.in_avals[0].dtype == jnp.uint8
    path = str(tmp_path / "raw.ivosx")
    ex.save_artifact(exported, path)
    loaded = ex.load_artifact(path)

    rng = np.random.default_rng(5)
    img_u8 = rng.integers(0, 256, (h, w, 3)).astype(np.uint8)
    pos = np.zeros((h // 4, w // 4, o), np.float32)
    pos[1:3, 1:3, 1] = 1.0
    neg = np.zeros_like(pos)
    got = np.asarray(loaded(img_u8, pos, neg))

    fn, _ = ex.build_round_forward(model, variables, size,
                                   cfg.model.max_objects,
                                   pad_to=cfg.eval.pad_to)
    want = np.asarray(jax.jit(fn)(
        jnp.asarray(normalize_image(img_u8.astype(np.float32) / 255.0)),
        pos, neg))
    np.testing.assert_allclose(got, want, atol=1e-5)


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


def test_serving_bundle_roundtrip_and_loop(model_and_vars, tmp_path):
    """Drive a full 2-frame interactive round from the BUNDLE ONLY
    (extract -> interact -> aggregate_first -> propagate), then check
    every stage output equals the direct model.apply chain."""
    cfg, model, variables = model_and_vars
    size = cfg.eval.image_size
    o = cfg.model.max_objects + 1
    exports = ex.export_serving_bundle(model, variables, size,
                                       cfg.model.max_objects,
                                       platforms=("cpu",),
                                       pad_to=cfg.eval.pad_to)
    path = str(tmp_path / "bundle.ivosx")
    manifest = ex.save_bundle(exports, path, extra={"image_size": list(size)})
    bundle = ex.load_bundle(path)
    assert bundle.names == ["aggregate_first", "aggregate_update",
                            "extract", "interact", "propagate"]
    assert bundle.manifest == manifest

    # default contract: extract takes RAW uint8 RGB (normalize inside)
    fns = ex.build_serving_fns(model, variables, size,
                               cfg.model.max_objects, pad_to=cfg.eval.pad_to)
    fns = dict(fns, extract=ex.wrap_raw_image(*fns["extract"]))
    rng = np.random.default_rng(3)
    h, w = size
    hh, ww = h // 4, w // 4
    img0 = jnp.asarray(rng.integers(0, 256, (h, w, 3)), jnp.uint8)
    img1 = jnp.asarray(rng.integers(0, 256, (h, w, 3)), jnp.uint8)
    pos = jnp.zeros((hh, ww, o)).at[2:4, 2:4, 1].set(1.0)
    neg = jnp.zeros((hh, ww, o))
    bg = jnp.zeros((hh, ww, o)).at[..., 0].set(1.0)

    # bundle-driven loop
    feat0, emb0 = bundle["extract"](img0)
    int_feats, probs0 = bundle["interact"](feat0, pos, neg, bg)
    mem = bundle["aggregate_first"](int_feats)
    feat1, emb1 = bundle["extract"](img1)
    lab = jnp.argmax(probs0, axis=-1)
    ref_onehot = jax.nn.one_hot(lab.reshape(-1), o, dtype=jnp.float32)
    probs1, gmap = bundle["propagate"](
        feat1, emb1, emb0.reshape(-1, emb0.shape[-1]), ref_onehot,
        jnp.ones((hh, ww, o), jnp.float32), emb0, probs0, mem,
        jnp.ones((o,), jnp.float32))
    mem2 = bundle["aggregate_update"](int_feats, mem)

    # direct chain through the same build_serving_fns closures
    d_feat0, d_emb0 = fns["extract"][0](img0)
    d_if, d_p0 = fns["interact"][0](d_feat0, pos, neg, bg)
    d_mem = fns["aggregate_first"][0](d_if)
    d_feat1, d_emb1 = fns["extract"][0](img1)
    d_p1, d_gmap = fns["propagate"][0](
        d_feat1, d_emb1, d_emb0.reshape(-1, d_emb0.shape[-1]), ref_onehot,
        jnp.ones((hh, ww, o), jnp.float32), d_emb0, d_p0, d_mem,
        jnp.ones((o,), jnp.float32))
    d_mem2 = fns["aggregate_update"][0](d_if, d_mem)

    for got, want in [(probs0, d_p0), (probs1, d_p1), (gmap, d_gmap),
                      (mem, d_mem), (mem2, d_mem2)]:
        np.testing.assert_allclose(np.asarray(got, np.float32),
                                   np.asarray(want, np.float32), atol=1e-5)
    np.testing.assert_allclose(np.asarray(probs1).sum(-1), 1.0, atol=1e-4)


def test_bundle_tpu_cross_lowering(tmp_path):
    """Serving bundle lowers for TPU from a CPU-only host; the propagate
    entry embeds the Pallas matching kernel (tpu_custom_call)."""
    cfg = tiny_test_config()
    h, w = cfg.eval.image_size
    o = cfg.model.max_objects + 1
    model = MANet(cfg.model, matching_backend="pallas")
    variables = jax.jit(model.init)(
        jax.random.PRNGKey(0), jnp.zeros((1, h, w, 3)),
        jnp.zeros((1, h // 4, w // 4, o)), jnp.zeros((1, h // 4, w // 4, o)))
    exports = ex.export_serving_bundle(model, variables, (h, w),
                                       cfg.model.max_objects,
                                       platforms=("tpu",),
                                       pad_to=cfg.eval.pad_to)
    assert "tpu_custom_call" in exports["propagate"].mlir_module()
    path = str(tmp_path / "tpu_bundle.ivosx")
    ex.save_bundle(exports, path)
    loaded = ex.load_bundle(path)
    assert loaded.manifest["entries"]["propagate"]["platforms"] == ["tpu"]


def test_bundle_rejects_artifact_file(model_and_vars, tmp_path):
    cfg, model, variables = model_and_vars
    exported = ex.export_forward(model, variables, cfg.eval.image_size,
                                 cfg.model.max_objects,
                                 platforms=("cpu",), pad_to=cfg.eval.pad_to)
    path = str(tmp_path / "m.ivosx")
    ex.save_artifact(exported, path)
    with pytest.raises(ValueError, match="bad magic"):
        ex.load_bundle(path)


def test_cli_export_and_check(tmp_path, capsys):
    from scripts.export_model import main
    out = str(tmp_path / "cli.ivosx")
    main(["--out", out, "--tiny", "--check",
          "--platforms", "cpu", "--matching_backend", "jnp"])
    lines = capsys.readouterr().out.strip().splitlines()
    manifest = json.loads(lines[0])
    assert manifest["format"] == ex.FORMAT
    assert "matches direct apply" in lines[-1]


def test_sharded_cp_matching_exports_and_roundtrips(tmp_path):
    """Multi-chip serving artifacts: the context-parallel matching graph
    (shard_map + all-gather-min collectives) serializes via jax.export
    and reloads onto a same-size mesh, bit-identical to the single-device
    oracle. A serving fleet can ship the SHARDED graph, not just
    single-chip ones."""
    from jax.sharding import NamedSharding, PartitionSpec as P

    from cvpr2020_manet_tpu.ops.matching import global_matching
    from cvpr2020_manet_tpu.parallel.cp_matching import cp_match_flat
    from cvpr2020_manet_tpu.parallel.mesh import create_mesh

    mesh = create_mesh(data=1, context=8)
    rng = np.random.default_rng(0)
    q = rng.standard_normal((64, 16)).astype(np.float32)
    k = rng.standard_normal((128, 16)).astype(np.float32)
    oh = rng.integers(0, 2, (128, 3)).astype(np.float32)

    def fn(q, k, oh):
        return cp_match_flat(q, k, oh, mesh, "jnp")

    from jax import export as jex
    exported = jex.export(jax.jit(fn))(q, k, oh)
    assert exported.nr_devices == 8
    path = str(tmp_path / "cp.ivosx")
    ex.save_artifact(exported, path, extra={"mesh": {"data": 1,
                                                     "context": 8}})
    loaded = ex.load_artifact(path)
    rep = NamedSharding(mesh, P())
    args = [jax.device_put(a, rep) for a in (q, k, oh)]
    got = np.asarray(jax.jit(loaded.call)(*args))
    want = np.asarray(jax.jit(
        lambda: global_matching(q, k, oh, None))())
    np.testing.assert_array_equal(got, want)


def test_yuv420_artifact_matches_host_decoded_rgb(model_and_vars, tmp_path):
    """image_format='yuv420' artifact takes the decoder's planar (y, uv)
    pair and equals the float-contract graph fed the SAME frame decoded
    + normalized on the host — the whole colorspace+normalize transform
    lives inside the exported graph."""
    from cvpr2020_manet_tpu.data.davis import normalize_image
    from cvpr2020_manet_tpu.utils.ingest import (
        rgb_to_yuv420_host, yuv420_to_rgb)

    cfg, model, variables = model_and_vars
    h, w = cfg.eval.image_size
    o = cfg.model.max_objects + 1
    exported = ex.export_forward(model, variables, (h, w),
                                 cfg.model.max_objects,
                                 platforms=("cpu",), pad_to=cfg.eval.pad_to,
                                 image_format="yuv420")
    assert exported.in_avals[0].shape == (h, w)          # y plane
    assert exported.in_avals[1].shape == (h // 2, w // 2, 2)  # uv
    assert exported.in_avals[0].dtype == jnp.uint8
    path = str(tmp_path / "yuv.ivosx")
    ex.save_artifact(exported, path, extra={"image_input": "yuv420_planar"})
    loaded = ex.load_artifact(path)
    assert loaded.manifest["image_input"] == "yuv420_planar"

    rng = np.random.default_rng(11)
    img_u8 = rng.integers(0, 256, (h, w, 3)).astype(np.uint8)
    y, uv = rgb_to_yuv420_host(img_u8)
    pos = np.zeros((h // 4, w // 4, o), np.float32)
    pos[1:3, 1:3, 1] = 1.0
    neg = np.zeros_like(pos)
    got = np.asarray(loaded(y, uv, pos, neg))

    fn, _ = ex.build_round_forward(model, variables, (h, w),
                                   cfg.model.max_objects,
                                   pad_to=cfg.eval.pad_to)
    decoded = np.asarray(yuv420_to_rgb(jnp.asarray(y), jnp.asarray(uv)))
    want = np.asarray(jax.jit(fn)(
        jnp.asarray(normalize_image(decoded / 255.0), jnp.float32),
        pos, neg))
    np.testing.assert_allclose(got, want, atol=1e-5)


def test_export_rejects_unknown_image_format(model_and_vars):
    cfg, model, variables = model_and_vars
    with pytest.raises(ValueError):
        ex.export_forward(model, variables, cfg.eval.image_size,
                          cfg.model.max_objects, platforms=("cpu",),
                          pad_to=cfg.eval.pad_to, image_format="jpeg")
