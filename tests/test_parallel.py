"""Mesh / context-parallel matching / multi-chip dry-run tests
(8 virtual CPU devices, SURVEY.md §5d)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from cvpr2020_manet_tpu.ops import matching as M
from cvpr2020_manet_tpu.parallel.cp_matching import context_parallel_matching
from cvpr2020_manet_tpu.parallel.mesh import create_mesh


def test_mesh_shapes():
    mesh = create_mesh(data=4, context=2)
    assert mesh.shape == {"data": 4, "context": 2}
    mesh = create_mesh(context=2)   # data = -1 -> all remaining
    assert mesh.shape["data"] * 2 == len(jax.devices())


def test_cp_matching_matches_single_device(rng):
    mesh = create_mesh(data=2, context=4)
    nq, nk, c, o = 64, 256, 16, 3
    q = jnp.array(rng.normal(size=(nq, c)), jnp.float32)
    k = jnp.array(rng.normal(size=(nk, c)), jnp.float32)
    oh = jnp.array(np.eye(o, dtype=np.float32)[rng.integers(0, o, size=nk)])
    valid = jnp.array((rng.random(nk) > 0.4).astype(np.float32))
    got = np.asarray(context_parallel_matching(q, k, oh, valid, mesh))
    want = np.asarray(M.global_matching(q, k, oh, valid))
    np.testing.assert_allclose(got, want, atol=1e-6)


def test_cp_ring_schedule_matches_allgather(rng):
    mesh = create_mesh(data=1, context=8)
    nq, nk, c, o = 32, 512, 16, 4
    q = jnp.array(rng.normal(size=(nq, c)), jnp.float32)
    k = jnp.array(rng.normal(size=(nk, c)), jnp.float32)
    oh = jnp.array(np.eye(o, dtype=np.float32)[rng.integers(0, o, size=nk)])
    valid = jnp.array((rng.random(nk) > 0.2).astype(np.float32))
    ring = np.asarray(context_parallel_matching(
        q, k, oh, valid, mesh, schedule="ring"))
    ag = np.asarray(context_parallel_matching(
        q, k, oh, valid, mesh, schedule="allgather"))
    np.testing.assert_allclose(ring, ag, atol=1e-6)
    want = np.asarray(M.global_matching(q, k, oh, valid))
    np.testing.assert_allclose(ring, want, atol=1e-6)


def test_cp_matching_pallas_backend_composes(rng):
    """CP composes with the PRODUCTION Pallas kernel (VERDICT r2 #3): the
    per-shard matching runs ops/matching_pallas.global_matching_pallas
    (interpret mode on the CPU mesh) and must equal both the CP-jnp path
    and the single-device oracle. The combine is exact because
    normalize_distance is monotone (min commutes with it)."""
    mesh = create_mesh(data=2, context=4)
    nq, nk, c, o = 32, 256, 16, 3
    q = jnp.array(rng.normal(size=(nq, c)), jnp.float32)
    k = jnp.array(rng.normal(size=(nk, c)), jnp.float32)
    oh = jnp.array(np.eye(o, dtype=np.float32)[rng.integers(0, o, size=nk)])
    valid = jnp.array((rng.random(nk) > 0.4).astype(np.float32))
    got = np.asarray(context_parallel_matching(
        q, k, oh, valid, mesh, backend="pallas_interpret"))
    want = np.asarray(M.global_matching(q, k, oh, valid))
    np.testing.assert_allclose(got, want, atol=1e-5)
    ring = np.asarray(context_parallel_matching(
        q, k, oh, valid, mesh, schedule="ring", backend="pallas_interpret"))
    np.testing.assert_allclose(ring, want, atol=1e-5)


def test_cp_eval_round_matches_single_device():
    """Context-sharded stacked-memory EVAL (VERDICT r2 #3): an Evaluator
    with cp_mesh shards the matching-memory rows over 'context' and must
    produce the single-device evaluator's exact masks across rounds."""
    import dataclasses

    from cvpr2020_manet_tpu.config import tiny_test_config
    from cvpr2020_manet_tpu.data import SyntheticDataset
    from cvpr2020_manet_tpu.engine.evaluator import Evaluator
    from cvpr2020_manet_tpu.interactive.robot import InteractiveScribblesRobot
    from cvpr2020_manet_tpu.models import MANet

    base = tiny_test_config()
    cfg = dataclasses.replace(
        base, eval=dataclasses.replace(base.eval, matching_memory="stacked"))
    ds = SyntheticDataset(image_size=cfg.eval.image_size,
                          num_frames=cfg.eval.max_frames,
                          num_sequences=1, num_objects=2, scribble_sets=1)
    seq = ds.sequences()[0]
    gt = ds.gt_masks(seq)
    model = MANet(cfg.model, matching_backend="jnp")
    h, w = cfg.eval.image_size
    o = cfg.model.max_objects + 1
    variables = jax.jit(model.init)(
        jax.random.PRNGKey(0), jnp.zeros((1, h, w, 3)),
        jnp.zeros((1, h // 4, w // 4, o)), jnp.zeros((1, h // 4, w // 4, o)))

    mesh = create_mesh(data=2, context=4)
    robot = InteractiveScribblesRobot()
    results = {}
    for name, kw in (("single", {}), ("cp", {"cp_mesh": mesh})):
        ev = Evaluator(cfg, model, variables, **kw)
        state = ev.start_sequence(ds.images(seq), ds.num_objects(seq))
        masks = np.zeros_like(gt)
        per_round = []
        for _ in range(2):
            scr = robot.interact(seq, masks, gt, ds.num_objects(seq))
            masks = ev.run_round(state, scr.to_json(), gt.shape[1:],
                                 ds.num_objects(seq))
            per_round.append(masks.copy())
        results[name] = (per_round, np.asarray(state.prev_masks))

    for r, (m1, m2) in enumerate(zip(results["single"][0],
                                     results["cp"][0])):
        np.testing.assert_array_equal(m1, m2, err_msg=f"round {r}")
    np.testing.assert_allclose(results["single"][1], results["cp"][1],
                               rtol=1e-5, atol=1e-6)


def test_cp_matching_differentiable_through_min(rng):
    mesh = create_mesh(data=1, context=8)
    nq, nk, c, o = 16, 64, 8, 2
    q = jnp.array(rng.normal(size=(nq, c)), jnp.float32)
    k = jnp.array(rng.normal(size=(nk, c)), jnp.float32)
    oh = jnp.array(np.eye(o, dtype=np.float32)[rng.integers(0, o, size=nk)])
    valid = jnp.ones((nk,), jnp.float32)
    g = jax.grad(
        lambda q: context_parallel_matching(q, k, oh, valid, mesh).sum())(q)
    assert bool(jnp.isfinite(g).all())
    assert float(jnp.abs(g).sum()) > 0


def test_dryrun_multichip():
    import sys
    sys.path.insert(0, "/root/repo")
    import __graft_entry__ as entry
    entry.dryrun_multichip(8)


def test_dryrun_multichip_clean_subprocess():
    """Run dryrun_multichip the way the DRIVER does: a fresh process with
    NO conftest platform pinning, so the sandbox's default axon-TPU backend
    registration is live. Round-1 failed exactly here (MULTICHIP_r01.json:
    libtpu mismatch from an op dispatched to the default TPU backend) while
    the in-pytest test passed because conftest.py had already pinned CPU.
    dryrun_multichip must pin the platform itself."""
    import os
    import subprocess
    import sys

    env = dict(os.environ)
    env.pop("JAX_PLATFORMS", None)  # driver does not set it
    flags = env.get("XLA_FLAGS", "")
    if "xla_force_host_platform_device_count" not in flags:
        env["XLA_FLAGS"] = (
            flags + " --xla_force_host_platform_device_count=8").strip()
    proc = subprocess.run(
        [sys.executable, "-c",
         "import __graft_entry__ as e; e.dryrun_multichip(8)"],
        cwd="/root/repo", env=env, capture_output=True, text=True,
        timeout=560)
    assert proc.returncode == 0, (
        f"dryrun_multichip failed in clean subprocess:\n"
        f"--- stdout ---\n{proc.stdout[-2000:]}\n"
        f"--- stderr ---\n{proc.stderr[-2000:]}")
    assert "OK" in proc.stdout
