"""DAVIS label palette + indexed-PNG mask IO (SURVEY.md C19).

The DAVIS benchmark stores multi-object masks as palettized PNGs whose
palette is the PASCAL-VOC colormap; the reference saves predictions the
same way (ref:utils, expected). Bit-identical palette here.
"""

from __future__ import annotations

import numpy as np


def davis_palette() -> np.ndarray:
    """PASCAL-VOC / DAVIS 256-entry RGB palette, shape (256, 3) uint8."""
    palette = np.zeros((256, 3), np.uint8)
    for i in range(256):
        lab = i
        r = g = b = 0
        for j in range(8):
            r |= ((lab >> 0) & 1) << (7 - j)
            g |= ((lab >> 1) & 1) << (7 - j)
            b |= ((lab >> 2) & 1) << (7 - j)
            lab >>= 3
        palette[i] = [r, g, b]
    return palette


def save_indexed_png(path: str, mask: np.ndarray) -> None:
    """Save (H, W) uint8 label map as a palettized PNG (DAVIS format)."""
    from PIL import Image
    img = Image.fromarray(mask.astype(np.uint8), mode="P")
    img.putpalette(davis_palette().reshape(-1).tolist())
    img.save(path)


def load_indexed_png(path: str) -> np.ndarray:
    """Load a palettized PNG label map -> (H, W) int32."""
    from PIL import Image
    return np.asarray(Image.open(path), dtype=np.int32)
