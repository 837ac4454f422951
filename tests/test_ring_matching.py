"""Pallas RDMA ring matching kernel (SURVEY.md §3.3 ring row).

Each config runs in its OWN subprocess: the Pallas TPU interpreter
(`pltpu.InterpretParams`, which simulates the inter-chip DMAs on a CPU
mesh) is reliable for a single multi-device kernel invocation but has
been observed to deadlock intermittently when differently-shaped
invocations run back-to-back in one process — isolate, don't flake.

Config matrix: rings of 2 and 4 only. This sandbox has ONE physical CPU
core (nproc=1); interpret-mode simulations with 8 simulated devices
convoy on it and do not finish in bounded time (a tiny 2x4 run exceeded
560 s while the same shapes on 1x4 take ~8 s) — an environment limit,
not a kernel one. Larger rings (2x4 multi-ring, 1x8) need a multi-core
host or real multi-chip hardware.
"""

import os
import subprocess
import sys

import pytest

_SCRIPT = r"""
import jax
jax.config.update("jax_platforms", "cpu")
import functools
import numpy as np, jax.numpy as jnp
from jax.sharding import PartitionSpec as P, Mesh
from cvpr2020_manet_tpu.ops import matching as M
from cvpr2020_manet_tpu.ops.ring_matching_pallas import ring_matching_shard

data, ctx = int(sys.argv[1]), int(sys.argv[2])
rng = np.random.default_rng(0)
nq, nk, c, o = 64, 512, 16, 3
q = jnp.array(rng.normal(size=(nq, c)), jnp.float32)
k = jnp.array(rng.normal(size=(nk, c)), jnp.float32)
oh = jnp.array(np.eye(o, dtype=np.float32)[rng.integers(0, o, size=nk)])
mesh = Mesh(np.asarray(jax.devices("cpu")[:data * ctx]).reshape(data, ctx),
            ("data", "context"))
fn = jax.shard_map(
    functools.partial(ring_matching_shard, axis_name="context",
                      interpret=True, block_q=64, block_k=128),
    mesh=mesh, in_specs=(P(), P("context"), P("context")), out_specs=P(),
    check_vma=False)
got = np.asarray(fn(q, k, oh))
want = np.asarray(M.global_matching(q, k, oh))
np.testing.assert_allclose(got, want, atol=1e-5)

# integration surface: the CP API's kernel-level ring schedule
from cvpr2020_manet_tpu.parallel.cp_matching import context_parallel_matching
valid = jnp.ones((nk,), jnp.float32)
got2 = np.asarray(context_parallel_matching(
    q, k, oh, valid, mesh, schedule="ring_pallas",
    backend="pallas_interpret"))
np.testing.assert_allclose(got2, want, atol=1e-5)
print("RING OK", data, ctx)
"""


@pytest.mark.parametrize("data,ctx", [(1, 2), (1, 4)])
def test_ring_matching_matches_oracle(data, ctx):
    env = dict(os.environ)
    flags = env.get("XLA_FLAGS", "")
    if "xla_force_host_platform_device_count" not in flags:
        env["XLA_FLAGS"] = (
            flags + " --xla_force_host_platform_device_count=8").strip()
    proc = subprocess.run(
        [sys.executable, "-c", "import sys\n" + _SCRIPT,
         str(data), str(ctx)],
        cwd="/root/repo", env=env, capture_output=True, text=True,
        timeout=540)
    assert proc.returncode == 0, (
        f"ring kernel failed on {data}x{ctx}:\n{proc.stdout[-1500:]}\n"
        f"{proc.stderr[-1500:]}")
    assert "RING OK" in proc.stdout
