"""HRNet numerical parity vs torch: an independent torch twin with mmcv's
exact module layout/naming (stem, bottleneck stage1, transitions, HRModules
with up/down fusions) is converted via convert_torch_hrnet and must produce
identical branch outputs (ref: mmdet/models/backbones/hrnet.py)."""

import numpy as np
import pytest

torch = pytest.importorskip("torch")
import torch.nn as tnn

import jax.numpy as jnp

from ioudet.apis.checkpoint import convert_torch_hrnet
from ioudet.models.backbones.hrnet import HRNet

EXTRA = dict(
    # stage1 planes*4 = 96 != 64: exercises the projection shortcut exactly
    # like the real w18/w32 (whose stage1 is 64 -> 256)
    stage1=dict(num_modules=1, num_branches=1, num_blocks=(2,),
                num_channels=(24,)),
    stage2=dict(num_modules=1, num_branches=2, num_blocks=(2, 2),
                num_channels=(8, 16)),
    stage3=dict(num_modules=2, num_branches=3, num_blocks=(2, 2, 2),
                num_channels=(8, 16, 32)),
)


def _cbr(cin, cout, stride=1):
    return tnn.Sequential(
        tnn.Conv2d(cin, cout, 3, stride, 1, bias=False),
        tnn.BatchNorm2d(cout), tnn.ReLU(inplace=True))


class TBottleneck(tnn.Module):
    expansion = 4

    def __init__(self, inplanes, planes, downsample=None):
        super().__init__()
        self.conv1 = tnn.Conv2d(inplanes, planes, 1, bias=False)
        self.bn1 = tnn.BatchNorm2d(planes)
        self.conv2 = tnn.Conv2d(planes, planes, 3, 1, 1, bias=False)
        self.bn2 = tnn.BatchNorm2d(planes)
        self.conv3 = tnn.Conv2d(planes, planes * 4, 1, bias=False)
        self.bn3 = tnn.BatchNorm2d(planes * 4)
        self.relu = tnn.ReLU(inplace=True)
        self.downsample = downsample

    def forward(self, x):
        idt = x if self.downsample is None else self.downsample(x)
        out = self.relu(self.bn1(self.conv1(x)))
        out = self.relu(self.bn2(self.conv2(out)))
        out = self.bn3(self.conv3(out))
        return self.relu(out + idt)


class TBasicBlock(tnn.Module):
    def __init__(self, inplanes, planes, downsample=None):
        super().__init__()
        self.conv1 = tnn.Conv2d(inplanes, planes, 3, 1, 1, bias=False)
        self.bn1 = tnn.BatchNorm2d(planes)
        self.conv2 = tnn.Conv2d(planes, planes, 3, 1, 1, bias=False)
        self.bn2 = tnn.BatchNorm2d(planes)
        self.relu = tnn.ReLU(inplace=True)
        self.downsample = downsample

    def forward(self, x):
        idt = x if self.downsample is None else self.downsample(x)
        out = self.relu(self.bn1(self.conv1(x)))
        out = self.bn2(self.conv2(out))
        return self.relu(out + idt)


class THRModule(tnn.Module):
    """mmcv HRModule: branches + fuse_layers naming."""

    def __init__(self, num_branches, num_blocks, channels, in_channels):
        super().__init__()
        self.num_branches = num_branches
        branches = []
        for b in range(num_branches):
            blocks = []
            cin = in_channels[b]
            for j in range(num_blocks[b]):
                ds = None
                if cin != channels[b]:
                    ds = tnn.Sequential(
                        tnn.Conv2d(cin, channels[b], 1, bias=False),
                        tnn.BatchNorm2d(channels[b]))
                blocks.append(TBasicBlock(cin, channels[b], ds))
                cin = channels[b]
            branches.append(tnn.Sequential(*blocks))
        self.branches = tnn.ModuleList(branches)
        fuse = []
        for i in range(num_branches):
            row = []
            for j in range(num_branches):
                if j > i:
                    row.append(tnn.Sequential(
                        tnn.Conv2d(channels[j], channels[i], 1, bias=False),
                        tnn.BatchNorm2d(channels[i]),
                        tnn.Upsample(scale_factor=2 ** (j - i),
                                     mode="nearest")))
                elif j == i:
                    row.append(tnn.Identity())
                else:
                    steps = []
                    for k in range(i - j):
                        last = k == i - j - 1
                        ch = channels[i] if last else channels[j]
                        mods = [tnn.Conv2d(channels[j] if k == 0 else
                                           channels[j], ch, 3, 2, 1,
                                           bias=False),
                                tnn.BatchNorm2d(ch)]
                        if not last:
                            mods.append(tnn.ReLU(inplace=True))
                        steps.append(tnn.Sequential(*mods))
                    row.append(tnn.Sequential(*steps))
            fuse.append(tnn.ModuleList(row))
        self.fuse_layers = tnn.ModuleList(fuse)
        self.relu = tnn.ReLU(inplace=True)

    def forward(self, xs):
        feats = [br(x) for br, x in zip(self.branches, xs)]
        outs = []
        for i in range(self.num_branches):
            acc = None
            for j in range(self.num_branches):
                y = self.fuse_layers[i][j](feats[j])
                acc = y if acc is None else acc + y
            outs.append(self.relu(acc))
        return outs


class THRNet(tnn.Module):
    def __init__(self, extra):
        super().__init__()
        self.extra = extra
        self.conv1 = tnn.Conv2d(3, 64, 3, 2, 1, bias=False)
        self.bn1 = tnn.BatchNorm2d(64)
        self.conv2 = tnn.Conv2d(64, 64, 3, 2, 1, bias=False)
        self.bn2 = tnn.BatchNorm2d(64)
        self.relu = tnn.ReLU(inplace=True)
        s1 = extra["stage1"]
        blocks = []
        cin = 64
        for j in range(s1["num_blocks"][0]):
            ds = None
            planes = s1["num_channels"][0]
            if cin != planes * 4:
                ds = tnn.Sequential(tnn.Conv2d(cin, planes * 4, 1, bias=False),
                                    tnn.BatchNorm2d(planes * 4))
            blocks.append(TBottleneck(cin, planes, ds))
            cin = planes * 4
        self.layer1 = tnn.Sequential(*blocks)

        pre = [cin]
        for t, stage in enumerate(["stage2", "stage3"], start=1):
            if stage not in extra:
                break
            sc = extra[stage]
            cur = list(sc["num_channels"])
            trans = []
            for b in range(sc["num_branches"]):
                if b < len(pre):
                    if pre[b] != cur[b]:
                        trans.append(_cbr(pre[b], cur[b]))
                    else:
                        trans.append(tnn.Identity())
                else:
                    trans.append(tnn.Sequential(_cbr(pre[-1], cur[b], 2)))
            setattr(self, f"transition{t}", tnn.ModuleList(trans))
            mods = []
            in_ch = list(cur)
            for m in range(sc["num_modules"]):
                mods.append(THRModule(sc["num_branches"], sc["num_blocks"],
                                      cur, in_ch))
                in_ch = list(cur)
            setattr(self, f"stage{t + 1}", tnn.Sequential(*mods))
            pre = cur

    def forward(self, x):
        x = self.relu(self.bn1(self.conv1(x)))
        x = self.relu(self.bn2(self.conv2(x)))
        x = self.layer1(x)
        xs = [x]
        for t in (1, 2):
            if not hasattr(self, f"transition{t}"):
                break
            trans = getattr(self, f"transition{t}")
            new_xs = []
            for b, tr in enumerate(trans):
                src = xs[b] if b < len(xs) else xs[-1]
                new_xs.append(tr(src))
            xs = new_xs
            for mod in getattr(self, f"stage{t + 1}"):
                xs = mod(xs)
        return xs


@pytest.fixture(scope="module")
def torch_hrnet():
    torch.manual_seed(0)
    net = THRNet(EXTRA)
    net.eval()
    with torch.no_grad():  # non-trivial BN stats
        for m in net.modules():
            if isinstance(m, tnn.BatchNorm2d):
                m.running_mean.uniform_(-0.2, 0.2)
                m.running_var.uniform_(0.6, 1.4)
                m.weight.uniform_(0.7, 1.3)
                m.bias.uniform_(-0.2, 0.2)
    return net


def test_hrnet_outputs_match(torch_hrnet):
    sd = torch_hrnet.state_dict()
    params = convert_torch_hrnet(sd)
    net = HRNet(extra=EXTRA)
    x = np.random.default_rng(0).normal(0, 1, (1, 64, 64, 3)).astype(
        np.float32)
    outs = net.apply({"params": params}, jnp.asarray(x))
    with torch.no_grad():
        touts = torch_hrnet(torch.from_numpy(
            np.transpose(x, (0, 3, 1, 2))))
    assert len(outs) == len(touts) == 3
    for o, t in zip(outs, touts):
        tn = np.transpose(t.numpy(), (0, 2, 3, 1))
        np.testing.assert_allclose(np.asarray(o), tn, rtol=2e-4, atol=2e-4)
