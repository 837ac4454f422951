from cvpr2020_manet_tpu.models.encoder import ASPP, Encoder
from cvpr2020_manet_tpu.models.heads import (
    DynamicSegHead, InteractionHead, MemoryAggregator)
from cvpr2020_manet_tpu.models.manet import MANet
from cvpr2020_manet_tpu.models.resnet import ResNetBackbone

__all__ = [
    "ASPP", "Encoder", "DynamicSegHead", "InteractionHead",
    "MemoryAggregator", "MANet", "ResNetBackbone",
]
