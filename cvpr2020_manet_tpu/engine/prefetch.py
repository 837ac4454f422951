"""Host->device batch prefetch for the training loops.

`prefetch_to_device` keeps `size` batches in flight via async
`jax.device_put`, so batch i+1's transfer rides under step i's compute —
the TPU-side equivalent of the reference's multi-worker DataLoader
keeping the GPU fed (SURVEY.md §4.4 L4 row); worker-side parallelism
lives in data/grain_pipeline.py.

OPT-IN, not the default feed: on this sandbox's tunneled single-chip
backend, feeding pre-committed device arrays into the jitted step
compiled a SECOND executable and then ran ~20x slower per step than the
plain synchronous numpy feed — and even the numpy feed with no per-step
sync (train_step(sync=False) chains) ran 11-105 s/step in a fresh
process (docs/BENCHMARKS.md training table, async-feed caveat). The
trainer main() loops therefore feed synchronously. Use this on real
multi-host pods where per-host input sharding makes explicit placement
necessary; measure first.
"""

from __future__ import annotations

import collections
from typing import Any, Iterable, Iterator

import jax


def prefetch_to_device(iterator: Iterable[Any], sharding: Any,
                       size: int = 2) -> Iterator[Any]:
    """Yield items from `iterator` already transferred to device.

    sharding: a jax.sharding.Sharding or a pytree of them matching the
    items' structure (e.g. the trainers' per-key batch shardings dict).
    size: number of batches in flight (2 = classic double buffering).
    """
    if size < 1:
        raise ValueError(f"prefetch size must be >= 1, got {size}")
    buf: collections.deque = collections.deque()
    for item in iterator:
        buf.append(jax.device_put(item, sharding))
        if len(buf) >= size:
            yield buf.popleft()
    while buf:
        yield buf.popleft()
