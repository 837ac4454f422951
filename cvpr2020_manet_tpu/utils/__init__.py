from cvpr2020_manet_tpu.utils.colormap import davis_palette, save_indexed_png
from cvpr2020_manet_tpu.utils.meters import AverageMeter

__all__ = ["davis_palette", "save_indexed_png", "AverageMeter"]
