"""YUV 4:2:0 frame ingest: half the host->device bytes of RGB.

Production video arrives YUV420 from the codec (H.264/VP9 decoders emit
planar YUV, not RGB) — shipping it to the device in that format and
converting to RGB on-device is both the natural serving ingest path and
a 2x cut of the dominant transfer cost of batched propagation (BASELINE
config 4: raw 720p frames are ~181 MB/batch, docs/BENCHMARKS.md). The
reference ingests decoded RGB tensors from its torch dataloader
(ref: expected upstream `dataloaders/davis_2017_f.py`); the TPU-native
framing moves the colorspace step onto the chip where it fuses into the
normalize + first conv.

Conventions: full-range (JPEG/BT.601) YCbCr, integer host-side forward
transform (fixed-point, matches libjpeg rounding to within 1 LSB),
float device-side inverse, chroma subsampled by 2x2 box average and
upsampled nearest. RGB -> YUV420 -> RGB roundtrip error is bounded by
chroma subsampling (exact for flat 2x2 blocks, pinned in
tests/test_propagate_batch.py).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np


def rgb_to_yuv420_host(frames_u8: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """(..., H, W, 3) uint8 RGB -> ((..., H, W) Y, (..., H/2, W/2, 2) UV).

    Host-side test/compat path — real serving feeds decoder output
    directly. Fixed-point BT.601 full-range. H and W must be even.
    """
    h, w = frames_u8.shape[-3:-1]
    if h % 2 or w % 2:
        raise ValueError(f"YUV420 needs even dims, got {h}x{w}")
    rgb = frames_u8.astype(np.int32)
    r, g, b = rgb[..., 0], rgb[..., 1], rgb[..., 2]
    y = (77 * r + 150 * g + 29 * b + 128) >> 8
    # chroma from the 2x2 box-averaged RGB (decimate THEN transform:
    # one transform per output sample instead of four)
    r2 = _box2(r)
    g2 = _box2(g)
    b2 = _box2(b)
    u = ((-43 * r2 - 85 * g2 + 128 * b2 + 128) >> 8) + 128
    v = ((128 * r2 - 107 * g2 - 21 * b2 + 128) >> 8) + 128
    uv = np.stack([u, v], axis=-1)
    return (np.clip(y, 0, 255).astype(np.uint8),
            np.clip(uv, 0, 255).astype(np.uint8))


def _box2(c: np.ndarray) -> np.ndarray:
    """2x2 box average over the last two axes (int32 in/out)."""
    h, w = c.shape[-2:]
    c = c.reshape(*c.shape[:-2], h // 2, 2, w // 2, 2)
    return (c.sum(axis=(-3, -1)) + 2) >> 2


def yuv420_to_rgb(y_u8: jax.Array, uv_u8: jax.Array) -> jax.Array:
    """Device-side inverse: Y (..., H, W) + UV (..., H/2, W/2, 2) uint8
    -> float32 RGB in [0, 255] (..., H, W, 3). Nearest chroma upsample;
    elementwise, so XLA fuses it into the downstream normalize."""
    yf = y_u8.astype(jnp.float32)
    uvf = uv_u8.astype(jnp.float32) - 128.0
    uvf = jnp.repeat(jnp.repeat(uvf, 2, axis=-3), 2, axis=-2)
    u, v = uvf[..., 0], uvf[..., 1]
    r = yf + 1.402 * v
    g = yf - 0.344136 * u - 0.714136 * v
    b = yf + 1.772 * u
    return jnp.clip(jnp.stack([r, g, b], axis=-1), 0.0, 255.0)
