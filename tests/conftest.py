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
