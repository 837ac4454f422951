"""Golden tests: Pallas bucketed matching kernel vs the jnp oracle.

Runs in interpret mode on CPU (semantics-exact). Compiled-mode parity and
throughput are exercised on real TPU by bench.py.
"""

import jax.numpy as jnp
import numpy as np
import pytest

from cvpr2020_manet_tpu.ops.matching import global_matching
from cvpr2020_manet_tpu.ops.matching_pallas import (
    BucketedRef, global_matching_pallas, global_matching_prepared,
    prepare_ref)


@pytest.mark.parametrize("nq,nk,c,o", [
    (300, 700, 20, 3),      # ragged everything
    (64, 64, 8, 2),         # tiny
    (257, 1025, 128, 9),    # just past block boundaries, full C
])
def test_kernel_matches_oracle(rng, nq, nk, c, o):
    q = (0.1 * rng.normal(size=(nq, c))).astype(np.float32)
    k = (0.1 * rng.normal(size=(nk, c))).astype(np.float32)
    onehot = np.eye(o, dtype=np.float32)[rng.integers(0, o, size=nk)]
    valid = (rng.random(nk) > 0.3).astype(np.float32)
    want = np.asarray(global_matching(
        jnp.array(q), jnp.array(k), jnp.array(onehot), jnp.array(valid)))
    got = np.asarray(global_matching_pallas(
        jnp.array(q), jnp.array(k), jnp.array(onehot), jnp.array(valid),
        interpret=True))
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-6)


def test_empty_object_saturates(rng):
    q = rng.normal(size=(32, 8)).astype(np.float32)
    k = rng.normal(size=(64, 8)).astype(np.float32)
    onehot = np.zeros((64, 3), np.float32)
    onehot[:, 0] = 1.0
    got = np.asarray(global_matching_pallas(
        jnp.array(q), jnp.array(k), jnp.array(onehot), interpret=True))
    assert got[:, 1].min() == 1.0 and got[:, 2].min() == 1.0
    assert got[:, 0].max() < 1.0


def test_prepare_ref_bucketing_invariants(rng):
    nk, c, o = 300, 16, 3
    k = rng.normal(size=(nk, c)).astype(np.float32)
    labels = rng.integers(0, o, size=nk)
    onehot = np.eye(o, dtype=np.float32)[labels]
    b = prepare_ref(jnp.array(k), jnp.array(onehot), block_k=128)
    assert isinstance(b, BucketedRef)
    block_obj = np.asarray(b.block_obj)
    o_pad = 8
    # blocks are object-sorted: object ids non-decreasing over used blocks
    used = block_obj[block_obj < o_pad]
    assert (np.diff(used) >= 0).all()
    # every object's pixel count fits in its assigned blocks
    for obj in range(o):
        n_blocks = int((block_obj == obj).sum())
        assert n_blocks * 128 >= (labels == obj).sum()
    # sentinel rows have huge |k|^2 so they can never win
    sq = np.asarray(b.sqnorm).reshape(-1)
    n_real = (sq < 1e7).sum()
    assert n_real == nk


def test_prepared_path_equals_wrapper(rng):
    nq, nk, c, o = 100, 200, 24, 4
    q = jnp.array(rng.normal(size=(nq, c)), jnp.float32)
    k = jnp.array(rng.normal(size=(nk, c)), jnp.float32)
    onehot = jnp.array(np.eye(o, dtype=np.float32)[rng.integers(0, o, size=nk)])
    b = prepare_ref(k, onehot)
    a1 = np.asarray(global_matching_prepared(q, b, interpret=True))
    a2 = np.asarray(global_matching_pallas(q, k, onehot, interpret=True))
    np.testing.assert_allclose(a1, a2, atol=0)


def test_two_stage_min_variant_is_exact(rng):
    """The two-stage row-min (scripts/bench_matching_kernel.py
    --two_stage_min) is the same min, reassociated — bitwise equal."""
    nq, nk, c, o = 96, 1024, 24, 3
    q = jnp.array(rng.normal(size=(nq, c)), jnp.float32)
    k = jnp.array(rng.normal(size=(nk, c)), jnp.float32)
    onehot = jnp.array(np.eye(o, dtype=np.float32)[rng.integers(0, o, size=nk)])
    b = prepare_ref(k, onehot)
    base = np.asarray(global_matching_prepared(q, b, interpret=True))
    two = np.asarray(global_matching_prepared(q, b, interpret=True,
                                              two_stage_min=True))
    np.testing.assert_array_equal(base, two)


@pytest.mark.parametrize("nq,nk,c,o", [
    (300, 700, 20, 3),
    (257, 1025, 128, 9),
])
def test_int8_kernel_exact_on_dequantized(rng, nq, nk, c, o):
    """The int8 kernel computes the EXACT f32 distance between the
    quantized vectors: the jnp oracle fed the dequantized embeddings must
    reproduce it to float tolerance."""
    from cvpr2020_manet_tpu.ops.matching_pallas import (
        global_matching_pallas_int8, quantize_rows_int8,
        quantize_symmetric_int8)
    q = (0.1 * rng.normal(size=(nq, c))).astype(np.float32)
    k = (0.1 * rng.normal(size=(nk, c))).astype(np.float32)
    onehot = np.eye(o, dtype=np.float32)[rng.integers(0, o, size=nk)]
    valid = (rng.random(nk) > 0.3).astype(np.float32)

    q_hat, s_q = quantize_rows_int8(jnp.array(q))
    # the production path scopes the key scale to rows that enter a
    # bucket (labelled & valid) — replicate so dequantization matches
    used = (onehot.sum(-1) > 0) & (valid > 0)
    k_hat, s_k = quantize_symmetric_int8(jnp.array(k),
                                         row_mask=jnp.array(used))
    q_deq = np.asarray(q_hat, np.float32) * np.asarray(s_q)[:, None]
    k_deq = np.asarray(k_hat, np.float32) * float(s_k)
    want = np.asarray(global_matching(
        jnp.array(q_deq), jnp.array(k_deq), jnp.array(onehot),
        jnp.array(valid)))
    got = np.asarray(global_matching_pallas_int8(
        jnp.array(q), jnp.array(k), jnp.array(onehot), jnp.array(valid),
        interpret=True))
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)


def test_int8_kernel_close_to_f32(rng):
    """Quantization cost on realistic embedding magnitudes stays small in
    the normalized-distance space (the downstream heads' input)."""
    from cvpr2020_manet_tpu.ops.matching_pallas import (
        global_matching_pallas_int8)
    nq, nk, c, o = 400, 900, 100, 4
    q = (0.3 * rng.normal(size=(nq, c))).astype(np.float32)
    k = (0.3 * rng.normal(size=(nk, c))).astype(np.float32)
    # make some keys near-copies of queries so small distances (the
    # quality-relevant regime) are represented
    k[:200] = q[:200] + 0.01 * rng.normal(size=(200, c))
    onehot = np.eye(o, dtype=np.float32)[rng.integers(0, o, size=nk)]
    want = np.asarray(global_matching(
        jnp.array(q), jnp.array(k), jnp.array(onehot)))
    got = np.asarray(global_matching_pallas_int8(
        jnp.array(q), jnp.array(k), jnp.array(onehot), interpret=True))
    assert np.max(np.abs(got - want)) < 0.05
    assert np.mean(np.abs(got - want)) < 0.005


def test_int8_empty_object_saturates(rng):
    from cvpr2020_manet_tpu.ops.matching_pallas import (
        global_matching_pallas_int8)
    q = rng.normal(size=(32, 8)).astype(np.float32)
    k = rng.normal(size=(64, 8)).astype(np.float32)
    onehot = np.zeros((64, 3), np.float32)
    onehot[:, 0] = 1.0
    got = np.asarray(global_matching_pallas_int8(
        jnp.array(q), jnp.array(k), jnp.array(onehot), interpret=True))
    assert got[:, 1].min() == 1.0 and got[:, 2].min() == 1.0
    assert got[:, 0].max() < 1.0
