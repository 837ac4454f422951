"""Visualization utilities: framework overlays + the shim's
matplotlib plot_scribble."""

import numpy as np

from cvpr2020_manet_tpu.interactive.scribbles import scribbles2mask
from cvpr2020_manet_tpu.utils.colormap import davis_palette
from cvpr2020_manet_tpu.utils.visualize import (
    draw_scribbles, overlay_masks, save_image)

PAYLOAD = {"sequence": "s", "scribbles": [
    [{"path": [[0.1, 0.2], [0.9, 0.2]], "object_id": 1},
     {"path": [[0.1, 0.8], [0.9, 0.8]], "object_id": 0}],
    [],
]}


def test_overlay_masks_blend_and_background():
    img = np.full((8, 8, 3), 100, np.uint8)
    labels = np.zeros((8, 8), np.int32)
    labels[2:4] = 1
    out = overlay_masks(img, labels, alpha=0.5)
    assert out.dtype == np.uint8 and out.shape == img.shape
    # background untouched
    np.testing.assert_array_equal(out[0], img[0])
    # object rows blended toward palette color 1 = (128, 0, 0)
    want = np.round(0.5 * 100 + 0.5 * davis_palette()[1].astype(float))
    np.testing.assert_array_equal(out[2, 0], want.astype(np.uint8))


def test_draw_scribbles_marks_rasterized_pixels(tmp_path):
    img = np.zeros((16, 24, 3), np.uint8)
    out = draw_scribbles(img, PAYLOAD, frame=0, radius=0)
    # strokes land exactly where scribbles2mask rasterizes them
    m = scribbles2mask(PAYLOAD, (16, 24))[0]
    obj_px = out[m == 1]
    assert len(obj_px) > 0
    np.testing.assert_array_equal(obj_px, np.broadcast_to(
        davis_palette()[1], obj_px.shape))
    bg_px = out[m == 0]
    np.testing.assert_array_equal(bg_px, np.full_like(bg_px, 255))
    # untouched pixels stay black
    assert (out[m == -1] == 0).all()

    p = tmp_path / "overlay.png"
    save_image(str(p), out)
    from PIL import Image
    np.testing.assert_array_equal(np.asarray(Image.open(p)), out)


def test_shim_plot_scribble():
    import matplotlib
    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    from davisinteractive.utils.visualization import plot_scribble

    fig, ax = plt.subplots()
    plot_scribble(ax, PAYLOAD, frame=0, output_size=(16, 24))
    assert len(ax.lines) == 2               # one polyline per scribble
    xs, ys = ax.lines[0].get_data()
    assert xs.min() >= 0 and xs.max() <= 23 and ys.max() <= 15
    plt.close(fig)
