"""Pretrained-backbone import (SURVEY.md C21).

The reference initializes its DeepLab ResNet-101 trunk from an
ImageNet/COCO-pretrained torch checkpoint (Google-Drive links in the
reference README). This sandbox has no network, so the capability is a
converter: given a torchvision-style `resnet101` state_dict (obtained
out-of-band as .pth or .npz), produce our Flax backbone parameter subtree,
with BatchNorm running statistics folded into FrozenAffine (scale, bias)
pairs (models/layers.FrozenAffine; use `ModelConfig(norm='frozen')`).

Folding: y = γ (x - μ) / sqrt(σ² + ε) + β  ==  x · s + b
         s = γ / sqrt(σ² + ε),  b = β - μ s

Conv kernels transpose OIHW (torch) -> HWIO (Flax NHWC).
"""

from __future__ import annotations

from typing import Dict, Mapping, Sequence

import numpy as np

BN_EPS = 1e-5


def _fold_bn(prefix: str, sd: Mapping[str, np.ndarray]):
    gamma = np.asarray(sd[f"{prefix}.weight"], np.float32)
    beta = np.asarray(sd[f"{prefix}.bias"], np.float32)
    mean = np.asarray(sd[f"{prefix}.running_mean"], np.float32)
    var = np.asarray(sd[f"{prefix}.running_var"], np.float32)
    scale = gamma / np.sqrt(var + BN_EPS)
    bias = beta - mean * scale
    return {"scale": scale, "bias": bias}


def _conv(name: str, sd: Mapping[str, np.ndarray]):
    w = np.asarray(sd[f"{name}.weight"], np.float32)
    return {"kernel": np.transpose(w, (2, 3, 1, 0))}   # OIHW -> HWIO


def convert_torch_resnet(
    state_dict: Mapping[str, np.ndarray],
    depths: Sequence[int] = (3, 4, 23, 3),
) -> Dict:
    """torchvision resnet state_dict -> Flax `backbone` param subtree.

    Target tree matches models/resnet.ResNetBackbone with norm='frozen':
      stem_conv/kernel, stem_norm/{scale,bias},
      stage{s}_block{b}/{conv1..3, norm1..3, shortcut, shortcut_norm}.
    """
    params: Dict = {
        "stem_conv": _conv("conv1", state_dict),
        "stem_norm": _fold_bn("bn1", state_dict),
    }
    for s, n_blocks in enumerate(depths):
        for b in range(n_blocks):
            t = f"layer{s + 1}.{b}"
            block = {
                "conv1": _conv(f"{t}.conv1", state_dict),
                "norm1": _fold_bn(f"{t}.bn1", state_dict),
                "conv2": _conv(f"{t}.conv2", state_dict),
                "norm2": _fold_bn(f"{t}.bn2", state_dict),
                "conv3": _conv(f"{t}.conv3", state_dict),
                "norm3": _fold_bn(f"{t}.bn3", state_dict),
            }
            if f"{t}.downsample.0.weight" in state_dict:
                block["shortcut"] = _conv(f"{t}.downsample.0", state_dict)
                block["shortcut_norm"] = _fold_bn(
                    f"{t}.downsample.1", state_dict)
            params[f"stage{s + 1}_block{b}"] = block
    return params


def load_backbone_into(params: Dict, backbone_params: Dict) -> Dict:
    """Return a copy of full model `params` with encoder/backbone replaced.

    Shapes are validated leaf-by-leaf; a mismatch (e.g. wrong depths or a
    GN-configured model) raises with the offending path.
    """
    import jax

    new = jax.tree.map(lambda x: x, params)  # shallow copy of the tree
    target = new["encoder"]["backbone"]

    def merge(dst, src, path=""):
        for k, v in src.items():
            assert k in dst, f"missing key in model params: {path}/{k}"
            if isinstance(v, dict):
                merge(dst[k], v, f"{path}/{k}")
            else:
                assert tuple(dst[k].shape) == tuple(v.shape), (
                    f"shape mismatch at {path}/{k}: "
                    f"model {dst[k].shape} vs checkpoint {v.shape}")
                dst[k] = np.asarray(v, np.float32)

    merge(target, backbone_params)
    return new


def load_torch_file(path: str) -> Dict[str, np.ndarray]:
    """Load a .pth/.pt (torch, CPU) or .npz state dict into numpy."""
    if path.endswith(".npz"):
        return dict(np.load(path))
    import torch
    sd = torch.load(path, map_location="cpu", weights_only=True)
    if hasattr(sd, "state_dict"):
        sd = sd.state_dict()
    return {k: v.numpy() for k, v in sd.items()}
