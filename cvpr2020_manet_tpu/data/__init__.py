from cvpr2020_manet_tpu.data.synthetic import SyntheticDataset

__all__ = ["SyntheticDataset"]
