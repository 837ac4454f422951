"""Multi-host execution layer (parallel/distributed.py).

The real thing, not a mock: a 2-process CPU job (Gloo collectives over
localhost) runs full stage-1 train steps on distinct per-rank data
shards; the replicated states must come out bitwise-identical. The
upstream reference has no multi-host story at all (single-node
DataParallel, SURVEY.md §3.3) — this layer is the DCN-scale extension.
"""

import os
import socket
import subprocess
import sys

import jax
import numpy as np
import pytest

from cvpr2020_manet_tpu.parallel import distributed as dist

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_local_batch_size_single_process():
    assert dist.local_batch_size(4) == 4


def test_local_batch_size_indivisible_raises(monkeypatch):
    monkeypatch.setattr(jax, "process_count", lambda: 2)
    with pytest.raises(ValueError):
        dist.local_batch_size(3)
    assert dist.local_batch_size(4) == 2


def test_shard_host_batch_passthrough_single_process():
    batch = {"images": np.zeros((2, 3), np.float32)}
    out = dist.shard_host_batch(batch, {})
    assert out is not batch  # a copy of the dict...
    assert out["images"] is batch["images"]  # ...but numpy passes through


def test_multi_worker_markers(monkeypatch):
    for k in ("TPU_WORKER_HOSTNAMES", "TPU_PROCESS_BOUNDS",
              "MEGASCALE_COORDINATOR_ADDRESS"):
        monkeypatch.delenv(k, raising=False)
    assert dist._multi_worker_markers() == []
    # single-host TPU VMs (and this sandbox's sitecustomize) set a
    # one-entry TPU_WORKER_HOSTNAMES — that must NOT count
    monkeypatch.setenv("TPU_WORKER_HOSTNAMES", "localhost")
    assert dist._multi_worker_markers() == []
    monkeypatch.setenv("TPU_WORKER_HOSTNAMES", "host0,host1")
    assert dist._multi_worker_markers()
    monkeypatch.setenv("TPU_WORKER_HOSTNAMES", "localhost")
    monkeypatch.setenv("TPU_PROCESS_BOUNDS", "2,2,1")
    assert dist._multi_worker_markers()
    monkeypatch.setenv("TPU_PROCESS_BOUNDS", "1,1,1")
    assert dist._multi_worker_markers() == []


def test_initialize_refuses_silent_fallback_on_pod(monkeypatch):
    def boom():
        raise RuntimeError("metadata server unavailable")
    monkeypatch.setattr(jax.distributed, "initialize", boom)
    monkeypatch.setenv("TPU_WORKER_HOSTNAMES", "host0,host1")
    with pytest.raises(RuntimeError, match="refusing"):
        dist.initialize()
    # no multi-worker evidence -> single-process fallback
    monkeypatch.setenv("TPU_WORKER_HOSTNAMES", "localhost")
    monkeypatch.delenv("TPU_PROCESS_BOUNDS", raising=False)
    monkeypatch.delenv("MEGASCALE_COORDINATOR_ADDRESS", raising=False)
    assert dist.initialize() == (0, 1)


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        return s.getsockname()[1]


def test_two_process_train_states_identical(tmp_path):
    """2 ranks x 1 CPU device, distinct data shards, 2 SGD steps:
    both ranks must report the same loss and bitwise-equal params,
    and an orbax save/restore roundtrip (all ranks participating on a
    shared fs) must reproduce them."""
    port = _free_port()
    env = dict(os.environ)
    # the conftest's 8-device forcing must not leak into the workers —
    # each rank is 1 CPU device so the run stays cheap on this 1-core box
    env.pop("XLA_FLAGS", None)
    env.pop("JAX_PLATFORMS", None)
    # script-style invocation puts tests/ (not the repo) on sys.path[0]
    env["PYTHONPATH"] = REPO + os.pathsep + env.get("PYTHONPATH", "")
    worker = os.path.join(REPO, "tests", "_distributed_worker.py")
    snap = str(tmp_path / "snap")

    def launch(port):
        procs = [
            subprocess.Popen(
                [sys.executable, worker, str(rank), "2", str(port), snap],
                stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
                text=True, env=env, cwd=REPO)
            for rank in range(2)
        ]
        return procs, [p.communicate(timeout=600)[0] for p in procs]

    procs, outs = launch(port)
    if any(p.returncode for p in procs) and any(
            "already in use" in o.lower() for o in outs):
        # _free_port close-then-rebind race: another process grabbed the
        # port between probe and coordinator bind — retry once fresh
        procs, outs = launch(_free_port())
    for p, out in zip(procs, outs):
        assert p.returncode == 0, out
    def field(out, key):
        lines = [l for l in out.splitlines() if l.startswith(key)]
        assert lines, out
        return lines[-1].split()[1]
    losses = [float(field(o, "LOSS")) for o in outs]
    hashes = [field(o, "PARAMHASH") for o in outs]
    restored = [field(o, "RESTOREHASH") for o in outs]
    assert np.isfinite(losses).all()
    # loss is pmean'd over the global batch -> identical on every rank
    assert losses[0] == losses[1], losses
    assert hashes[0] == hashes[1], hashes
    assert restored == hashes, (restored, hashes)
