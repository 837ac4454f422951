"""`davisinteractive.utils.visualization` — scribble plotting (upstream:
davisinteractive/utils/visualization.py).

`plot_scribble` draws one frame's scribble polylines onto a matplotlib
axes, colored per object. Image-space rasterized overlays (no
matplotlib) live in `cvpr2020_manet_tpu.utils.visualize`.
"""

from typing import Any, Dict, Optional, Tuple

import numpy as np

from cvpr2020_manet_tpu.interactive.scribbles import Scribbles
from cvpr2020_manet_tpu.utils.colormap import davis_palette

__all__ = ["plot_scribble", "draw_scribble"]


def draw_scribble(img: np.ndarray, scribble, frame: int,
                  output_size: Optional[Tuple[int, int]] = None,
                  width: int = 3) -> np.ndarray:
    """Image-space counterpart of `plot_scribble` (upstream convention:
    draw one frame's strokes directly onto an RGB image array).

    `output_size=(H, W)` resizes the canvas first; `width` is the stroke
    thickness in pixels. Returns a new uint8 array."""
    from cvpr2020_manet_tpu.utils.visualize import draw_scribbles

    img = np.asarray(img)
    if output_size is not None and tuple(img.shape[:2]) != tuple(output_size):
        from PIL import Image
        h, w = output_size
        img = np.asarray(Image.fromarray(img.astype(np.uint8)).resize(
            (w, h), Image.BILINEAR))
    return draw_scribbles(img.astype(np.uint8), scribble, frame,
                          radius=max(0, (int(width) - 1) // 2))


def plot_scribble(ax, scribble, frame: int,
                  output_size: Optional[Tuple[int, int]] = None,
                  **line_kwargs):
    """Plot a scribble payload's `frame` on matplotlib axes `ax`.

    Path coordinates are normalized [0, 1]; with `output_size=(H, W)`
    they scale to pixel coordinates (matching `scribbles2mask`), which
    lines up with an `ax.imshow(frame_image)` underneath. Extra kwargs
    pass through to `ax.plot`. Returns `ax`.
    """
    sc: Dict[str, Any] = (scribble.to_json()
                          if isinstance(scribble, Scribbles) else scribble)
    palette = davis_palette().astype(np.float64) / 255.0
    for line in sc["scribbles"][frame]:
        path = np.asarray(line["path"], dtype=np.float64)
        if path.size == 0:
            continue
        x, y = path[:, 0], path[:, 1]
        if output_size is not None:
            h, w = output_size
            x, y = x * (w - 1), y * (h - 1)
        obj = int(line["object_id"])
        color = palette[obj] if obj > 0 else (1.0, 1.0, 1.0)
        ax.plot(x, y, color=tuple(color), **line_kwargs)
    return ax
