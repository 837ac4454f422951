"""Custom-VJP (argmin-routed) gradients of the Pallas local matching vs
jax.grad through the jnp oracle's hard min (interpret mode on CPU)."""

import functools

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from cvpr2020_manet_tpu.ops import local_matching_pallas as LMP
from cvpr2020_manet_tpu.ops import matching as M


@pytest.fixture(autouse=True)
def _interpret(monkeypatch):
    orig = LMP.local_matching_pallas_argmin

    def interp(*a, **kw):
        kw["interpret"] = True
        return orig(*a, **kw)
    monkeypatch.setattr(LMP, "local_matching_pallas_argmin", interp)
    yield


def _problem(rng, h=6, w=9, c=8, o=3):
    q = jnp.array(0.3 * rng.normal(size=(h, w, c)), jnp.float32)
    k = jnp.array(0.3 * rng.normal(size=(h, w, c)), jnp.float32)
    labels = rng.integers(0, o, (h, w))
    oh = jnp.array(np.eye(o, dtype=np.float32)[labels])
    return q, k, oh


def test_trainable_local_forward_matches_oracle(rng):
    q, k, oh = _problem(rng)
    got = np.asarray(LMP.local_matching_trainable(q, k, oh, 2))
    want = np.asarray(M.local_matching(q, k, oh, window=2))
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-6)


def test_trainable_local_grads_match_oracle_grads(rng):
    q, k, oh = _problem(rng)
    wgt = jnp.array(rng.normal(size=(6, 9, 3)), jnp.float32)

    def loss_pallas(q, k):
        return jnp.sum(LMP.local_matching_trainable(q, k, oh, 2) * wgt)

    def loss_oracle(q, k):
        return jnp.sum(M.local_matching(q, k, oh, window=2) * wgt)

    gq_p, gk_p = jax.grad(loss_pallas, argnums=(0, 1))(q, k)
    gq_o, gk_o = jax.grad(loss_oracle, argnums=(0, 1))(q, k)
    np.testing.assert_allclose(np.asarray(gq_p), np.asarray(gq_o),
                               rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(gk_p), np.asarray(gk_o),
                               rtol=1e-4, atol=1e-5)


def test_trainable_local_empty_object_zero_grad(rng):
    h, w, c = 5, 7, 4
    q = jnp.array(rng.normal(size=(h, w, c)), jnp.float32)
    k = jnp.array(rng.normal(size=(h, w, c)), jnp.float32)
    # object 1 has no previous-frame pixels anywhere
    oh = jnp.zeros((h, w, 2), jnp.float32).at[..., 0].set(1.0)

    def loss(q):
        return jnp.sum(LMP.local_matching_trainable(q, k, oh, 2)[..., 1])

    g = jax.grad(loss)(q)
    np.testing.assert_allclose(np.asarray(g), 0.0, atol=1e-8)


def test_trainable_local_under_vmap(rng):
    """The trainers vmap propagate over frames — the VJP must map."""
    b = 2
    qs, ks, ohs = [], [], []
    for _ in range(b):
        q, k, oh = _problem(rng, h=4, w=5, c=4, o=2)
        qs.append(q), ks.append(k), ohs.append(oh)
    q, k, oh = jnp.stack(qs), jnp.stack(ks), jnp.stack(ohs)

    fn = jax.vmap(functools.partial(LMP.local_matching_trainable, window=1))

    def loss(q, k):
        return jnp.sum(fn(q, k, oh))

    g = jax.grad(loss, argnums=(0, 1))(q, k)
    want = jax.grad(
        lambda q: jnp.sum(jax.vmap(
            lambda a, b_, c_: M.local_matching(a, b_, c_, window=1)
        )(q, k, oh)))(q)
    np.testing.assert_allclose(np.asarray(g[0]), np.asarray(want),
                               rtol=1e-4, atol=1e-5)
