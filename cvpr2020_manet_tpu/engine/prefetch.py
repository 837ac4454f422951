"""Host->device batch prefetch for the training loops.

The tunnel's upload cost (~66 MB/s + ~34 ms/dispatch, docs/BENCHMARKS.md)
is pure overhead when the trainer uploads batch i+1 only after step i's
metrics sync. `prefetch_to_device` keeps `size` batches in flight:
`jax.device_put` is asynchronous, so batch i+1's transfer rides under
step i's compute and the steady-state step pays max(compute, upload)
instead of their sum. This is the TPU-side equivalent of the reference's
multi-worker DataLoader keeping the GPU fed (SURVEY.md §4.4 L4 row);
worker-side parallelism lives in data/grain_pipeline.py — this hides the
*device transfer*, which torch DataLoaders never see.
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
