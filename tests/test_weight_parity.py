"""Backbone numerical parity vs torch: build an independent torch ResNet-18
(torchvision layout/naming), convert its weights with convert_torch_resnet,
and require our FrozenBN flax ResNet to reproduce its eval-mode outputs.
This validates both the converter and the backbone's conv/BN/pool semantics
(stride placement, padding, +eps, downsample wiring)."""

import numpy as np
import pytest
import torch
import torch.nn as tnn

from ioudet.apis.checkpoint import convert_torch_resnet


class TorchBasicBlock(tnn.Module):
    def __init__(self, inplanes, planes, stride=1):
        super().__init__()
        self.conv1 = tnn.Conv2d(inplanes, planes, 3, stride, 1, bias=False)
        self.bn1 = tnn.BatchNorm2d(planes)
        self.conv2 = tnn.Conv2d(planes, planes, 3, 1, 1, bias=False)
        self.bn2 = tnn.BatchNorm2d(planes)
        self.relu = tnn.ReLU()
        if stride != 1 or inplanes != planes:
            self.downsample = tnn.Sequential(
                tnn.Conv2d(inplanes, planes, 1, stride, bias=False),
                tnn.BatchNorm2d(planes))
        else:
            self.downsample = None

    def forward(self, x):
        idt = x if self.downsample is None else self.downsample(x)
        out = self.relu(self.bn1(self.conv1(x)))
        out = self.bn2(self.conv2(out))
        return self.relu(out + idt)


class TorchResNet18(tnn.Module):
    def __init__(self):
        super().__init__()
        self.conv1 = tnn.Conv2d(3, 64, 7, 2, 3, bias=False)
        self.bn1 = tnn.BatchNorm2d(64)
        self.relu = tnn.ReLU()
        self.maxpool = tnn.MaxPool2d(3, 2, 1)
        chans = [64, 64, 128, 256, 512]
        for i in range(4):
            blocks = []
            for j in range(2):
                stride = (1 if i == 0 else 2) if j == 0 else 1
                inp = chans[i] if j == 0 else chans[i + 1]
                blocks.append(TorchBasicBlock(inp, chans[i + 1], stride))
            setattr(self, f"layer{i + 1}", tnn.Sequential(*blocks))

    def forward(self, x):
        x = self.maxpool(self.relu(self.bn1(self.conv1(x))))
        outs = []
        for i in range(4):
            x = getattr(self, f"layer{i + 1}")(x)
            outs.append(x)
        return outs


@pytest.fixture(scope="module")
def torch_model():
    torch.manual_seed(0)
    m = TorchResNet18()
    # randomize BN stats so eval-mode normalization is non-trivial
    with torch.no_grad():
        for mod in m.modules():
            if isinstance(mod, tnn.BatchNorm2d):
                mod.running_mean.uniform_(-0.5, 0.5)
                mod.running_var.uniform_(0.5, 2.0)
                mod.weight.uniform_(0.5, 1.5)
                mod.bias.uniform_(-0.5, 0.5)
    m.eval()
    return m


class TestBackboneParity:
    def test_resnet18_outputs_match(self, torch_model):
        import jax
        import jax.numpy as jnp
        from ioudet.models import build_backbone

        sd = torch_model.state_dict()
        params = convert_torch_resnet(sd, depth=18)

        backbone = build_backbone(dict(type="ResNet", depth=18,
                                       frozen_stages=-1,
                                       norm_cfg=dict(type="FrozenBN")))
        rng = np.random.default_rng(0)
        x = rng.normal(0, 1, (1, 64, 96, 3)).astype(np.float32)

        with torch.no_grad():
            touts = torch_model(torch.from_numpy(
                np.transpose(x, (0, 3, 1, 2))))
        outs = backbone.apply({"params": params}, jnp.asarray(x))
        assert len(outs) == 4
        for ours, theirs in zip(outs, touts):
            theirs = np.transpose(theirs.numpy(), (0, 2, 3, 1))
            np.testing.assert_allclose(np.asarray(ours), theirs,
                                       rtol=1e-3, atol=1e-3)

    def test_converted_tree_structure(self, torch_model):
        params = convert_torch_resnet(torch_model.state_dict(), depth=18)
        assert params["conv1"]["kernel"].shape == (7, 7, 3, 64)
        assert set(params["bn1"]) == {"scale", "bias", "mean", "var"}
        assert "layer1_0" in params and "layer4_1" in params
        assert "downsample_conv" in params["layer2_0"]
        assert "downsample_conv" not in params["layer1_0"]
