"""Custom-VJP (argmin-routed) gradients of the Pallas matching vs
jax.grad through the jnp oracle's hard min (interpret mode on CPU)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from cvpr2020_manet_tpu.ops import matching as M
from cvpr2020_manet_tpu.ops import matching_pallas as MP


@pytest.fixture(autouse=True)
def _interpret(monkeypatch):
    # run the kernels in interpret mode on CPU for these tests
    orig = MP.global_matching_prepared_argmin

    def interp(query, bucketed, **kw):
        kw["interpret"] = True
        return orig(query, bucketed, **kw)
    monkeypatch.setattr(MP, "global_matching_prepared_argmin", interp)
    yield


def test_trainable_forward_matches_oracle(rng):
    nq, nk, c, o = 40, 90, 8, 3
    q = jnp.array(0.3 * rng.normal(size=(nq, c)), jnp.float32)
    k = jnp.array(0.3 * rng.normal(size=(nk, c)), jnp.float32)
    oh = jnp.array(np.eye(o, dtype=np.float32)[rng.integers(0, o, nk)])
    got = np.asarray(MP.global_matching_trainable(q, k, oh))
    want = np.asarray(M.global_matching(q, k, oh))
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-6)


def test_trainable_grads_match_oracle_grads(rng):
    nq, nk, c, o = 24, 60, 8, 3
    q = jnp.array(0.3 * rng.normal(size=(nq, c)), jnp.float32)
    k = jnp.array(0.3 * rng.normal(size=(nk, c)), jnp.float32)
    oh = jnp.array(np.eye(o, dtype=np.float32)[rng.integers(0, o, nk)])
    w = jnp.array(rng.normal(size=(nq, o)), jnp.float32)   # arbitrary loss

    def loss_pallas(q, k):
        return jnp.sum(MP.global_matching_trainable(q, k, oh) * w)

    def loss_oracle(q, k):
        return jnp.sum(M.global_matching(q, k, oh) * w)

    gq_p, gk_p = jax.grad(loss_pallas, argnums=(0, 1))(q, k)
    gq_o, gk_o = jax.grad(loss_oracle, argnums=(0, 1))(q, k)
    np.testing.assert_allclose(np.asarray(gq_p), np.asarray(gq_o),
                               rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(gk_p), np.asarray(gk_o),
                               rtol=1e-4, atol=1e-5)


def test_empty_object_zero_grad(rng):
    nq, nk, c = 10, 20, 4
    q = jnp.array(rng.normal(size=(nq, c)), jnp.float32)
    k = jnp.array(rng.normal(size=(nk, c)), jnp.float32)
    oh = jnp.zeros((nk, 2), jnp.float32).at[:, 0].set(1.0)  # object 1 empty

    def loss(q):
        return jnp.sum(MP.global_matching_trainable(q, k, oh)[:, 1])

    g = jax.grad(loss)(q)
    np.testing.assert_allclose(np.asarray(g), 0.0, atol=1e-8)
