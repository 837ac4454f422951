"""Persistent-compilation-cache setup shared by every CLI entry point.

On this class of deployment, compiles go through a remote AOT service at
minutes per graph (docs/BENCHMARKS.md "known overheads") — a CLI that
forgets to enable the persistent cache recompiles the full flagship
graph set from scratch AND throws the result away (the round-4 dress
rehearsal burned 40 minutes on `model.init` alone this way). Every
`main()` calls `enable_persistent_cache()` before touching jax.

Override the location with MANET_COMPILATION_CACHE; note /tmp does not
survive sandbox re-instantiation, so the first run of a fresh sandbox
still pays cold compiles.
"""

from __future__ import annotations

import os

DEFAULT_CACHE_DIR = "/tmp/jax_tpu_cache"


def enable_persistent_cache(min_compile_seconds: float = 5.0) -> str:
    """Point jax at the shared on-disk compilation cache. Idempotent;
    defers to a cache dir already configured by the embedding process
    (e.g. the test suite's conftest uses its own directory).

    Also honors MANET_PLATFORM (e.g. "cpu"): the sandbox's sitecustomize
    force-registers the remote axon TPU backend via jax.config,
    OVERRIDING the standard JAX_PLATFORMS env var — so CLI subprocesses
    (tests, orchestrators) need an in-process override hook to run off
    the chip."""
    import jax
    platform = os.environ.get("MANET_PLATFORM")
    if platform:
        jax.config.update("jax_platforms", platform)
    current = jax.config.jax_compilation_cache_dir
    if current:
        return current
    path = os.environ.get("MANET_COMPILATION_CACHE", DEFAULT_CACHE_DIR)
    jax.config.update("jax_compilation_cache_dir", path)
    jax.config.update("jax_persistent_cache_min_compile_time_secs",
                      float(min_compile_seconds))
    return path
