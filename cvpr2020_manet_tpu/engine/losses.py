"""Training losses (SURVEY.md C17, ref:train_stage*.py expected).

Bootstrapped (top-k / OHEM-style) pixel cross-entropy: average only the
hardest `ratio` fraction of pixels, with the ratio annealed from 1.0 at
the start of training (everything counts) down to `final_ratio` — the
schedule the reference family (FEELVOS/MANet) uses for its seg losses.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def pixel_cross_entropy(logits: jax.Array, labels: jax.Array,
                        valid: jax.Array | None = None) -> jax.Array:
    """Per-pixel CE. logits (..., O) float; labels (...) int; -> (...)."""
    logp = jax.nn.log_softmax(logits, axis=-1)
    ce = -jnp.take_along_axis(logp, labels[..., None], axis=-1)[..., 0]
    if valid is not None:
        ce = ce * valid
    return ce


def bootstrapped_cross_entropy(
    logits: jax.Array,     # (..., O)
    labels: jax.Array,     # (...)
    ratio,                 # scalar in (0, 1]: fraction of hardest pixels kept
    valid: jax.Array | None = None,
) -> jax.Array:
    """Mean CE over the hardest `ratio` fraction of (valid) pixels.

    `ratio` may be a traced scalar (annealed per step): the cut is made by
    sorting the per-pixel losses and gathering a dynamic quantile
    threshold — no dynamic shapes.
    """
    ce = pixel_cross_entropy(logits, labels, valid).reshape(-1)
    n = ce.shape[0]
    ratio = jnp.asarray(ratio, jnp.float32)
    # size the cut from the VALID pixel count: invalid pixels contribute
    # zero loss and must not dilute the kept fraction
    n_valid = (jnp.sum(valid).astype(jnp.float32) if valid is not None
               else jnp.float32(n))
    k = jnp.clip((ratio * n_valid).astype(jnp.int32), 1, n)
    ce_sorted = jnp.sort(ce)[::-1]          # descending: hardest first
    idx = jnp.arange(n)
    kept = jnp.where(idx < k, ce_sorted, 0.0)
    return jnp.sum(kept) / k.astype(jnp.float32)


def bootstrap_ratio_schedule(step, warmup_steps: int, final_ratio: float):
    """1.0 -> final_ratio linearly over `warmup_steps` (then constant)."""
    frac = jnp.clip(step / max(warmup_steps, 1), 0.0, 1.0)
    return 1.0 + (final_ratio - 1.0) * frac
