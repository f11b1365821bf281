"""Caffe-style ResNet bottlenecks (stride on the first 1x1 conv).

Ref: mmdet/models/backbones/resnet.py (Bottleneck.__init__: style in
('pytorch', 'caffe'); conv1_stride/conv2_stride swap).  The caffe form is
what the reference's guided-anchoring / FCOS / C4 config families use.

Parity: an independent torch twin with caffe stride placement must be
reproduced exactly by our flax ResNet(style='caffe') after weight
conversion (the param layout is style-invariant; only stride placement
differs, so this pins the code path, not just the converter).
"""

import numpy as np
import pytest
import torch
import torch.nn as tnn

from ioudet.apis.checkpoint import convert_torch_resnet


class TorchCaffeBottleneck(tnn.Module):
    def __init__(self, inplanes, planes, stride=1):
        super().__init__()
        out_ch = planes * 4
        # caffe: stride on conv1 (1x1), conv2 (3x3) stride 1
        self.conv1 = tnn.Conv2d(inplanes, planes, 1, stride, bias=False)
        self.bn1 = tnn.BatchNorm2d(planes)
        self.conv2 = tnn.Conv2d(planes, planes, 3, 1, 1, bias=False)
        self.bn2 = tnn.BatchNorm2d(planes)
        self.conv3 = tnn.Conv2d(planes, out_ch, 1, bias=False)
        self.bn3 = tnn.BatchNorm2d(out_ch)
        self.relu = tnn.ReLU()
        if stride != 1 or inplanes != out_ch:
            self.downsample = tnn.Sequential(
                tnn.Conv2d(inplanes, out_ch, 1, stride, bias=False),
                tnn.BatchNorm2d(out_ch))
        else:
            self.downsample = None

    def forward(self, x):
        idt = x if self.downsample is None else self.downsample(x)
        out = self.relu(self.bn1(self.conv1(x)))
        out = self.relu(self.bn2(self.conv2(out)))
        out = self.bn3(self.conv3(out))
        return self.relu(out + idt)


class TorchCaffeResNetStub(tnn.Module):
    """Two-stage (layer1: 2 blocks, layer2: 2 blocks) caffe-style stub."""

    def __init__(self):
        super().__init__()
        self.conv1 = tnn.Conv2d(3, 64, 7, 2, 3, bias=False)
        self.bn1 = tnn.BatchNorm2d(64)
        self.relu = tnn.ReLU()
        self.maxpool = tnn.MaxPool2d(3, 2, 1)
        self.layer1 = tnn.Sequential(
            TorchCaffeBottleneck(64, 64, 1), TorchCaffeBottleneck(256, 64, 1))
        self.layer2 = tnn.Sequential(
            TorchCaffeBottleneck(256, 128, 2),
            TorchCaffeBottleneck(512, 128, 1))

    def forward(self, x):
        x = self.maxpool(self.relu(self.bn1(self.conv1(x))))
        o1 = self.layer1(x)
        o2 = self.layer2(o1)
        return [o1, o2]


@pytest.fixture(scope="module")
def torch_caffe():
    torch.manual_seed(3)
    m = TorchCaffeResNetStub()
    with torch.no_grad():
        for mod in m.modules():
            if isinstance(mod, tnn.BatchNorm2d):
                mod.running_mean.uniform_(-0.5, 0.5)
                mod.running_var.uniform_(0.5, 2.0)
                mod.weight.uniform_(0.5, 1.5)
                mod.bias.uniform_(-0.5, 0.5)
    m.eval()
    return m


def test_caffe_style_matches_torch_twin(torch_caffe):
    import jax.numpy as jnp

    from ioudet.models.backbones.resnet import ResNet

    # register a tiny (2, 2)-block bottleneck arch matching the torch stub
    from ioudet.models.backbones import resnet as R

    orig = R.ARCH_SETTINGS.get(50)
    R.ARCH_SETTINGS[5050] = (R.Bottleneck, (2, 2))
    try:
        model = ResNet(depth=5050, num_stages=2, out_indices=(0, 1),
                       style="caffe")
        params = convert_torch_resnet(torch_caffe.state_dict())
        x = np.random.default_rng(0).normal(
            0, 1, (1, 64, 96, 3)).astype(np.float32)
        outs = model.apply({"params": params}, jnp.asarray(x))
        with torch.no_grad():
            touts = torch_caffe(torch.from_numpy(
                np.ascontiguousarray(x.transpose(0, 3, 1, 2))))
        for o, t in zip(outs, touts):
            t = t.numpy().transpose(0, 2, 3, 1)
            assert o.shape == t.shape
            np.testing.assert_allclose(np.asarray(o), t, atol=2e-4)
    finally:
        del R.ARCH_SETTINGS[5050]
        assert R.ARCH_SETTINGS[50] is orig


def test_caffe_vs_pytorch_differ_only_under_stride():
    """Same weights: styles agree exactly on stride-1 blocks and differ on
    stride-2 ones (the swap is real, not a no-op)."""
    import jax
    import jax.numpy as jnp

    from ioudet.models.backbones.resnet import Bottleneck

    x = jnp.asarray(np.random.default_rng(1).normal(
        0, 1, (1, 16, 16, 64)).astype(np.float32))

    for stride, should_match in [(1, True), (2, False)]:
        outs = {}
        for style in ("pytorch", "caffe"):
            blk = Bottleneck(planes=16, stride=stride, downsample=True,
                             style=style)
            params = blk.init(jax.random.PRNGKey(0), x)["params"]
            outs[style] = np.asarray(blk.apply({"params": params}, x))
        if should_match:
            np.testing.assert_allclose(outs["pytorch"], outs["caffe"],
                                       atol=1e-6)
        else:
            assert outs["pytorch"].shape == outs["caffe"].shape
            assert not np.allclose(outs["pytorch"], outs["caffe"])
