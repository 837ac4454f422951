"""Pretrained converter: torch BN-folding parity against torch itself."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

torch = pytest.importorskip("torch")

from cvpr2020_manet_tpu.config import tiny_test_config
from cvpr2020_manet_tpu.models.resnet import ResNetBackbone
from cvpr2020_manet_tpu.utils.pretrained import (
    convert_torch_resnet, load_backbone_into)


def make_torch_resnet_sd(depths, width, rng):
    """Build a torchvision-naming state dict with random weights."""
    sd = {}

    def conv(name, cin, cout, k):
        sd[f"{name}.weight"] = rng.normal(
            size=(cout, cin, k, k)).astype(np.float32) * 0.1

    def bn(name, c):
        sd[f"{name}.weight"] = rng.uniform(0.5, 1.5, c).astype(np.float32)
        sd[f"{name}.bias"] = rng.normal(size=c).astype(np.float32) * 0.1
        sd[f"{name}.running_mean"] = rng.normal(size=c).astype(np.float32)
        sd[f"{name}.running_var"] = rng.uniform(0.5, 2.0, c).astype(np.float32)

    conv("conv1", 3, width, 7)
    bn("bn1", width)
    cin = width
    for s, n in enumerate(depths):
        ch = width * (2 ** s)
        for b in range(n):
            t = f"layer{s + 1}.{b}"
            conv(f"{t}.conv1", cin if b == 0 else ch * 4, ch, 1)
            bn(f"{t}.bn1", ch)
            conv(f"{t}.conv2", ch, ch, 3)
            bn(f"{t}.bn2", ch)
            conv(f"{t}.conv3", ch, ch * 4, 1)
            bn(f"{t}.bn3", ch * 4)
            if b == 0:
                conv(f"{t}.downsample.0", cin, ch * 4, 1)
                bn(f"{t}.downsample.1", ch * 4)
        cin = ch * 4
    return sd


def test_bn_folding_matches_torch_eval(rng):
    """Folded FrozenAffine == torch BN in eval mode, bitwise-ish."""
    c = 8
    sd = {}
    sd["bn.weight"] = rng.uniform(0.5, 1.5, c).astype(np.float32)
    sd["bn.bias"] = rng.normal(size=c).astype(np.float32)
    sd["bn.running_mean"] = rng.normal(size=c).astype(np.float32)
    sd["bn.running_var"] = rng.uniform(0.5, 2.0, c).astype(np.float32)
    from cvpr2020_manet_tpu.utils.pretrained import _fold_bn
    fold = _fold_bn("bn", sd)
    x = rng.normal(size=(2, 5, 5, c)).astype(np.float32)
    ours = x * fold["scale"] + fold["bias"]

    bn = torch.nn.BatchNorm2d(c).eval()
    bn.weight.data = torch.tensor(sd["bn.weight"])
    bn.bias.data = torch.tensor(sd["bn.bias"])
    bn.running_mean.data = torch.tensor(sd["bn.running_mean"])
    bn.running_var.data = torch.tensor(sd["bn.running_var"])
    with torch.no_grad():
        want = bn(torch.tensor(x).permute(0, 3, 1, 2)).permute(0, 2, 3, 1)
    np.testing.assert_allclose(ours, want.numpy(), rtol=1e-5, atol=1e-6)


def test_convert_and_load_into_model(rng):
    depths, width = (1, 1, 1, 1), 16
    sd = make_torch_resnet_sd(depths, width, rng)
    converted = convert_torch_resnet(sd, depths)

    backbone = ResNetBackbone(depths=depths, width=width, norm="frozen",
                              dtype=jnp.float32)
    variables = jax.jit(backbone.init)(jax.random.PRNGKey(0),
                                       jnp.zeros((1, 32, 32, 3)))
    params = {"encoder": {"backbone": variables["params"]}}
    merged = load_backbone_into(params, converted)
    got = merged["encoder"]["backbone"]

    # spot-check a folded value and a transposed kernel
    w = sd["conv1.weight"]
    np.testing.assert_allclose(
        np.asarray(got["stem_conv"]["kernel"]),
        np.transpose(w, (2, 3, 1, 0)))
    # the merged backbone still runs
    low, trunk = backbone.apply({"params": got}, jnp.ones((1, 32, 32, 3)))
    assert np.isfinite(np.asarray(trunk)).all()


def test_load_rejects_shape_mismatch(rng):
    depths, width = (1, 1, 1, 1), 16
    sd = make_torch_resnet_sd(depths, width, rng)
    converted = convert_torch_resnet(sd, depths)
    backbone = ResNetBackbone(depths=depths, width=8, norm="frozen",
                              dtype=jnp.float32)   # wrong width
    variables = jax.jit(backbone.init)(jax.random.PRNGKey(0),
                                       jnp.zeros((1, 32, 32, 3)))
    params = {"encoder": {"backbone": variables["params"]}}
    with pytest.raises(AssertionError, match="shape mismatch"):
        load_backbone_into(params, converted)
