"""BFP + HRFPN numerical parity vs independent torch twins (closing the
VERDICT r2 'lighter tests' tier for these necks).

Twins implement the reference algorithms directly with torch ops:
  * BFP (ref: mmdet/models/necks/bfp.py (BFP)): gather via
    adaptive_max_pool2d / nearest interpolate, integrate (mean), refine
    (3x3 conv+relu OR embedded-gaussian non-local with reduction=1,
    use_scale=False — the Libra configs' instantiation), scatter the
    residual back.
  * HRFPN (ref: mmdet/models/necks/hrfpn.py (HRFPN)): bilinear upsample all
    branches to the top resolution, concat, 1x1 reduce, avg-pool pyramid,
    per-level 3x3 convs.
"""

import numpy as np
import pytest

torch = pytest.importorskip("torch")
import torch.nn as tnn
import torch.nn.functional as F

import jax
import jax.numpy as jnp

from ioudet.models.necks.bfp import BFP
from ioudet.models.necks.hrfpn import HRFPN


def _t(x):  # NHWC numpy -> NCHW torch
    return torch.from_numpy(np.asarray(x, np.float32).transpose(0, 3, 1, 2))


def _n(y):  # NCHW torch -> NHWC numpy
    return y.detach().numpy().transpose(0, 2, 3, 1)


def _copy_conv(tconv, fparams):
    """flax HWIO kernel + bias -> torch Conv2d OIHW."""
    with torch.no_grad():
        tconv.weight.copy_(torch.from_numpy(
            np.asarray(fparams["kernel"], np.float32).transpose(3, 2, 0, 1)))
        if tconv.bias is not None:
            tconv.bias.copy_(torch.from_numpy(
                np.asarray(fparams["bias"], np.float32)))


def _pyramid(rng, c=16, base=16, levels=5, batch=2):
    return [rng.standard_normal(
        (batch, base // 2 ** i, (base + base // 2) // 2 ** i, c)
        ).astype(np.float32) for i in range(levels)]


class TorchNonLocal(tnn.Module):
    """Embedded-gaussian non-local, reduction=1, use_scale=False (ref:
    mmdet/models/plugins/non_local.py (NonLocal2D) as instantiated by BFP
    in the libra configs)."""

    def __init__(self, c):
        super().__init__()
        self.theta = tnn.Conv2d(c, c, 1)
        self.phi = tnn.Conv2d(c, c, 1)
        self.g = tnn.Conv2d(c, c, 1)
        self.conv_out = tnn.Conv2d(c, c, 1)

    def forward(self, x):
        n, c, h, w = x.shape
        th = self.theta(x).view(n, c, h * w).permute(0, 2, 1)  # (n, hw, c)
        ph = self.phi(x).view(n, c, h * w)                     # (n, c, hw)
        gx = self.g(x).view(n, c, h * w).permute(0, 2, 1)      # (n, hw, c)
        attn = torch.softmax(torch.matmul(th, ph), dim=-1)     # (n, hw, hw)
        y = torch.matmul(attn, gx).permute(0, 2, 1).view(n, c, h, w)
        return x + self.conv_out(y)


def torch_bfp(inputs, refine, refine_level):
    target = inputs[refine_level].shape[2:]
    gathered = []
    for i, x in enumerate(inputs):
        if i < refine_level:
            gathered.append(F.adaptive_max_pool2d(x, output_size=target))
        else:
            gathered.append(F.interpolate(x, size=target, mode="nearest"))
    bsf = sum(gathered) / len(gathered)
    bsf = refine(bsf)
    outs = []
    for i, x in enumerate(inputs):
        if i < refine_level:
            r = F.interpolate(bsf, size=x.shape[2:], mode="nearest")
        elif i > refine_level:
            r = F.adaptive_max_pool2d(bsf, output_size=x.shape[2:])
        else:
            r = bsf
        outs.append(x + r)
    return outs


class TestBFP:
    @pytest.mark.parametrize("refine_type", ["conv", "non_local", None])
    def test_parity(self, refine_type):
        rng = np.random.default_rng(0)
        c = 16
        feats = _pyramid(rng, c=c)
        m = BFP(in_channels=c, num_levels=5, refine_level=2,
                refine_type=refine_type)
        v = m.init(jax.random.PRNGKey(0), tuple(jnp.asarray(f)
                                                for f in feats))
        outs = m.apply(v, tuple(jnp.asarray(f) for f in feats))

        tins = [_t(f) for f in feats]
        if refine_type == "conv":
            conv = tnn.Conv2d(c, c, 3, padding=1)
            _copy_conv(conv, v["params"]["refine"]["conv"])
            refine = lambda x: F.relu(conv(x))
        elif refine_type == "non_local":
            tnl = TorchNonLocal(c)
            for name in ("theta", "phi", "g", "conv_out"):
                _copy_conv(getattr(tnl, name), v["params"]["refine"][name])
            refine = tnl
        else:
            refine = lambda x: x
        touts = torch_bfp(tins, refine, refine_level=2)
        assert len(outs) == len(touts)
        for o, t in zip(outs, touts):
            np.testing.assert_allclose(np.asarray(o), _n(t), atol=2e-5)

    def test_nonlocal_zero_init_is_near_conv_free_refine(self):
        """conv_out is zero-init, so at init non_local refine == identity
        refine (refine_type=None) — the Libra blocks start as residual
        no-ops."""
        rng = np.random.default_rng(1)
        feats = tuple(jnp.asarray(f) for f in _pyramid(rng))
        m_nl = BFP(in_channels=16, refine_type="non_local")
        m_id = BFP(in_channels=16, refine_type=None)
        v = m_nl.init(jax.random.PRNGKey(0), feats)
        outs_nl = m_nl.apply(v, feats)
        outs_id = m_id.apply({"params": {}}, feats)
        for a, b in zip(outs_nl, outs_id):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       atol=1e-6)

    def test_unknown_refine_type_raises(self):
        rng = np.random.default_rng(2)
        feats = tuple(jnp.asarray(f) for f in _pyramid(rng))
        with pytest.raises(ValueError):
            BFP(in_channels=16, refine_type="bogus").init(
                jax.random.PRNGKey(0), feats)


class TestHRFPN:
    def test_parity(self):
        rng = np.random.default_rng(3)
        in_ch = (8, 16, 32, 64)
        feats = [rng.standard_normal((2, 32 // 2 ** i, 48 // 2 ** i, ci)
                                     ).astype(np.float32)
                 for i, ci in enumerate(in_ch)]
        m = HRFPN(in_channels=in_ch, out_channels=24, num_outs=5)
        v = m.init(jax.random.PRNGKey(0), tuple(jnp.asarray(f)
                                                for f in feats))
        outs = m.apply(v, tuple(jnp.asarray(f) for f in feats))

        tins = [_t(f) for f in feats]
        tfeats = [tins[0]] + [
            F.interpolate(x, scale_factor=2 ** i, mode="bilinear",
                          align_corners=False)
            for i, x in enumerate(tins[1:], 1)]
        x = torch.cat(tfeats, dim=1)
        red = tnn.Conv2d(sum(in_ch), 24, 1)
        _copy_conv(red, v["params"]["reduction"]["conv"])
        x = red(x)
        for i in range(5):
            cur = x if i == 0 else F.avg_pool2d(x, 2 ** i, stride=2 ** i)
            fpn = tnn.Conv2d(24, 24, 3, padding=1)
            _copy_conv(fpn, v["params"][f"fpn_{i}"]["conv"])
            t = fpn(cur)
            np.testing.assert_allclose(np.asarray(outs[i]), _n(t),
                                       atol=2e-4)
            assert outs[i].shape[1:3] == tuple(t.shape[2:])
