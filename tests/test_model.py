"""Shape/semantics tests for the MANet model on the tiny config."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from cvpr2020_manet_tpu.config import tiny_test_config
from cvpr2020_manet_tpu.models import MANet


@pytest.fixture(scope="module")
def model_and_vars():
    cfg = tiny_test_config()
    model = MANet(cfg.model, matching_backend="jnp")
    h, w = cfg.eval.image_size
    hh, ww = h // 4, w // 4
    o = cfg.model.max_objects + 1
    rng = jax.random.PRNGKey(0)
    variables = model.init(
        rng,
        jnp.zeros((1, h, w, 3)),
        jnp.zeros((1, hh, ww, o)),
        jnp.zeros((1, hh, ww, o)),
    )
    return cfg, model, variables


def test_extract_features_shapes(model_and_vars):
    cfg, model, variables = model_and_vars
    h, w = cfg.eval.image_size
    feat, emb = model.apply(variables, jnp.zeros((2, h, w, 3)),
                            method=model.extract_features)
    assert feat.shape == (2, h // 4, w // 4, cfg.model.decoder_channels)
    assert emb.shape == (2, h // 4, w // 4, cfg.model.embedding_dim_padded)


def test_interact_and_propagate_shapes(model_and_vars):
    cfg, model, variables = model_and_vars
    h, w = cfg.eval.image_size
    hh, ww = h // 4, w // 4
    o = cfg.model.max_objects + 1
    ce = cfg.model.embedding_dim_padded
    key = jax.random.PRNGKey(1)
    feat = jax.random.normal(key, (hh, ww, cfg.model.decoder_channels))
    emb = jax.random.normal(key, (hh, ww, ce))
    maps = jax.nn.one_hot(
        jax.random.randint(key, (hh, ww), 0, o), o)

    int_feats, int_logits = model.apply(
        variables, feat, maps, 1.0 - maps, maps, method=model.interact)
    assert int_feats.shape == (o, hh, ww, cfg.model.ma_channels)
    assert int_logits.shape == (hh, ww, o)

    mem = model.apply(variables, int_feats, jnp.zeros_like(int_feats), True,
                      method=model.aggregate_memory)
    np.testing.assert_allclose(np.asarray(mem), np.asarray(int_feats))

    obj_valid = jnp.array([1.0, 1.0] + [0.0] * (o - 2))
    logits, gmap = model.apply(
        variables, feat, emb, emb.reshape(-1, ce), maps.reshape(-1, o),
        None, jnp.ones((hh, ww, o)), emb, maps, mem, obj_valid,
        method=model.propagate)
    assert logits.shape == (hh, ww, o)
    assert gmap.shape == (hh, ww, o)
    # invalid objects can never win the softmax
    assert np.asarray(logits)[..., 2:].max() < -1e8
    # self-matching: global map for the annotated frame against itself is ~0
    # wherever the object exists
    g = np.asarray(gmap)
    lab = np.asarray(jnp.argmax(maps, -1))
    assert g[lab == 1, 1].max() < 1e-3


def test_memory_aggregation_gate_blends(model_and_vars):
    cfg, model, variables = model_and_vars
    o = cfg.model.max_objects + 1
    f = jnp.ones((o, 4, 4, cfg.model.ma_channels))
    m = -jnp.ones((o, 4, 4, cfg.model.ma_channels))
    fused = model.apply(variables, f, m, False, method=model.aggregate_memory)
    fused = np.asarray(fused)
    # gated blend stays strictly inside the hull of {f, m}
    assert fused.min() >= -1.0 - 1e-5 and fused.max() <= 1.0 + 1e-5
    assert not np.allclose(fused, np.asarray(f))


def test_decomposed_head_matches_fused_propagate(rng):
    """MANet.propagate(head_pre=...) — conv0 decomposed into precomputed
    feature/memory contributions + per-frame maps conv — must match the
    fused path up to float summation order (models/manet.py)."""
    import jax

    from cvpr2020_manet_tpu.config import tiny_test_config

    cfg = tiny_test_config().model
    model = MANet(cfg, matching_backend="jnp")
    o = cfg.max_objects + 1
    h, w = 16, 24
    variables = jax.jit(model.init)(
        jax.random.PRNGKey(0), jnp.zeros((1, h * 4, w * 4, 3)),
        jnp.zeros((1, h, w, o)), jnp.zeros((1, h, w, o)))

    def r(*shape):
        return jnp.asarray(rng.normal(size=shape), jnp.float32)

    feat = r(h, w, cfg.decoder_channels)
    emb_t, prev_emb = r(h, w, cfg.embedding_dim_padded), r(h, w, cfg.embedding_dim_padded)
    ref_emb = r(h * w, cfg.embedding_dim_padded)
    ref_oh = jax.nn.one_hot(
        jnp.asarray(rng.integers(0, o, h * w)), o, dtype=jnp.float32)
    gmap_prev = jnp.ones((h, w, o), jnp.float32)
    prev_mask = jax.nn.softmax(r(h, w, o), axis=-1)
    int_mem = r(o, h, w, cfg.ma_channels)
    obj_valid = jnp.ones((o,), jnp.float32)

    args = (feat, emb_t, ref_emb, ref_oh, None, gmap_prev, prev_emb,
            prev_mask, int_mem, obj_valid)
    fused_logits, fused_gm = model.apply(variables, *args,
                                         method=model.propagate)

    fp = model.apply(variables, feat, method=model.head_feat_contrib)
    mp = model.apply(variables, int_mem, method=model.head_mem_contrib)
    dec_logits, dec_gm = model.apply(
        variables, *args, method=model.propagate,
        head_pre=fp[None] + mp)

    np.testing.assert_allclose(np.asarray(dec_gm), np.asarray(fused_gm))
    np.testing.assert_allclose(np.asarray(dec_logits),
                               np.asarray(fused_logits),
                               rtol=1e-4, atol=1e-4)
