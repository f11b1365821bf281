"""SSD-VGG numerical parity vs torch: an independent torch twin with
mmdet's exact module layout (vgg16 ``features`` Sequential incl. ceil-mode
pools, pool5 3x3/s1, dilated fc6, ``extra`` tower, L2Norm) converted via
convert_torch_ssd_vgg must produce identical feature maps (ref:
mmdet/models/backbones/ssd_vgg.py)."""

import numpy as np
import pytest

torch = pytest.importorskip("torch")
import torch.nn as tnn
import torch.nn.functional as F

import jax.numpy as jnp

from ioudet.apis.checkpoint import convert_torch_ssd_vgg
from ioudet.models.backbones.ssd_vgg import SSDVGG


class TL2Norm(tnn.Module):
    def __init__(self, ch, scale=20.0, eps=1e-10):
        super().__init__()
        self.weight = tnn.Parameter(torch.full((ch,), scale))
        self.eps = eps

    def forward(self, x):
        norm = x.pow(2).sum(1, keepdim=True).sqrt() + self.eps
        return self.weight[None, :, None, None] * x / norm


class TSSDVGG(tnn.Module):
    def __init__(self):
        super().__init__()
        cfg = [64, 64, "M", 128, 128, "M", 256, 256, 256, "M",
               512, 512, 512, "M", 512, 512, 512]
        layers = []
        cin = 3
        for v in cfg:
            if v == "M":
                layers.append(tnn.MaxPool2d(2, 2))
            else:
                layers += [tnn.Conv2d(cin, v, 3, padding=1),
                           tnn.ReLU(inplace=True)]
                cin = v
        layers += [tnn.MaxPool2d(3, 1, 1),                       # pool5
                   tnn.Conv2d(512, 1024, 3, padding=6, dilation=6),  # fc6
                   tnn.ReLU(inplace=True),
                   tnn.Conv2d(1024, 1024, 1),                    # fc7
                   tnn.ReLU(inplace=True)]
        self.features = tnn.Sequential(*layers)
        extras = [(1024, 256, 1, 1, 0), (256, 512, 3, 2, 1),
                  (512, 128, 1, 1, 0), (128, 256, 3, 2, 1),
                  (256, 128, 1, 1, 0), (128, 256, 3, 1, 0),
                  (256, 128, 1, 1, 0), (128, 256, 3, 1, 0)]
        self.extra = tnn.Sequential(*[
            tnn.Conv2d(ci, co, k, s, p) for ci, co, k, s, p in extras])
        self.l2_norm = TL2Norm(512)

    def forward(self, x):
        outs = []
        for i, layer in enumerate(self.features):
            x = layer(x)
            if i == 22:                       # conv4_3 relu output
                outs.append(self.l2_norm(x))
        outs.append(x)                        # fc7 output
        for i, layer in enumerate(self.extra):
            x = F.relu(layer(x), inplace=True)
            if i % 2 == 1:
                outs.append(x)
        return outs


def test_ssd_vgg_outputs_match():
    torch.manual_seed(0)
    net = TSSDVGG().eval()
    params = convert_torch_ssd_vgg(net.state_dict())
    ours = SSDVGG(input_size=300)
    x = np.random.default_rng(0).normal(0, 1, (1, 300, 300, 3)).astype(
        np.float32)
    outs = ours.apply({"params": params}, jnp.asarray(x))
    with torch.no_grad():
        touts = net(torch.from_numpy(np.transpose(x, (0, 3, 1, 2))))
    assert len(outs) == len(touts) == 6
    for o, t in zip(outs, touts):
        tn = np.transpose(t.numpy(), (0, 2, 3, 1))
        assert o.shape == tn.shape, (o.shape, tn.shape)
        np.testing.assert_allclose(np.asarray(o), tn, rtol=2e-4, atol=2e-4)
