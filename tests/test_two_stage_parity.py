"""Two-stage checkpoint-converter parity (VERDICT r4 next #2 — the converter
trio convert_torch_{rpn_head,shared_fc_bbox_head,faster_rcnn} shipped in
round 4 untested; this file is the test its docstring cites).

Independent torch twins of the mmdet v1 module layouts (ResNet-18 + FPN with
maxpool-extra level + RPNHead + SharedFCBBoxHead + FCNMaskHead, random
weights) must produce the SAME outputs as our flax modules after conversion.
The two silent-breakage hot spots called out by the verdict are asserted
directly:
  * SharedFCBBoxHead's first fc consumes torch's channel-major (C, S, S)
    flatten while our trunk flattens spatial-major (S, S, C)
    (ref: mmdet/models/bbox_heads/convfc_bbox_head.py (SharedFCBBoxHead));
  * FCNMaskHead's ConvTranspose upsample is gradient-of-conv in torch but a
    fractionally-strided forward conv in flax (spatial flip + axis permute),
    and mmdet's conv_logits carries an unused bg channel our head drops
    (ref: mmdet/models/mask_heads/fcn_mask_head.py (FCNMaskHead)).
"""

import numpy as np
import pytest
import torch
import torch.nn as tnn
import torch.nn.functional as F

from ioudet.apis.checkpoint import (convert_torch_faster_rcnn,
                                    convert_torch_fcn_mask_head,
                                    convert_torch_mask_rcnn,
                                    convert_torch_rpn_head,
                                    convert_torch_shared_fc_bbox_head)
from tests.test_weight_parity import TorchResNet18

FEAT = 64          # FPN/head channels (small twin of the reference's 256)
NUM_CLASSES = 5    # incl. background


class ConvModule(tnn.Module):
    """mmdet ConvModule key layout: `<name>.conv.{weight,bias}`."""

    def __init__(self, cin, cout, k, stride=1, padding=0):
        super().__init__()
        self.conv = tnn.Conv2d(cin, cout, k, stride, padding)

    def forward(self, x):
        return self.conv(x)


class TorchFPN4(tnn.Module):
    """mmdet v1 Faster R-CNN FPN: start_level=0 (all 4 inputs),
    add_extra_convs=False -> P6 = maxpool(P5, 1, stride 2)."""

    def __init__(self, in_channels=(64, 128, 256, 512), out=FEAT,
                 num_outs=5):
        super().__init__()
        self.lateral_convs = tnn.ModuleList(
            [ConvModule(c, out, 1) for c in in_channels])
        self.fpn_convs = tnn.ModuleList(
            [ConvModule(out, out, 3, padding=1) for _ in in_channels])
        self.num_outs = num_outs

    def forward(self, inputs):
        laterals = [l(inputs[i]) for i, l in enumerate(self.lateral_convs)]
        for i in range(len(laterals) - 1, 0, -1):
            laterals[i - 1] = laterals[i - 1] + F.interpolate(
                laterals[i], scale_factor=2, mode="nearest")
        outs = [self.fpn_convs[i](laterals[i]) for i in range(len(laterals))]
        while len(outs) < self.num_outs:
            outs.append(F.max_pool2d(outs[-1], 1, stride=2))
        return outs


class TorchRPNHead(tnn.Module):
    """mmdet v1 RPNHead: 3x3 conv + 1x1 cls/reg (A=3, sigmoid)."""

    def __init__(self, in_ch=FEAT, num_anchors=3):
        super().__init__()
        self.rpn_conv = tnn.Conv2d(in_ch, in_ch, 3, padding=1)
        self.rpn_cls = tnn.Conv2d(in_ch, num_anchors, 1)
        self.rpn_reg = tnn.Conv2d(in_ch, num_anchors * 4, 1)

    def forward(self, feats):
        cls_out, reg_out = [], []
        for x in feats:
            t = F.relu(self.rpn_conv(x))
            cls_out.append(self.rpn_cls(t))
            reg_out.append(self.rpn_reg(t))
        return cls_out, reg_out


class TorchSharedFCBBoxHead(tnn.Module):
    """mmdet v1 SharedFCBBoxHead: x.flatten(1) on NCHW (CHANNEL-major) then
    2 shared fcs -> fc_cls / fc_reg."""

    def __init__(self, in_ch=FEAT, roi_size=7, fc_out=FEAT,
                 num_classes=NUM_CLASSES):
        super().__init__()
        self.shared_fcs = tnn.ModuleList([
            tnn.Linear(in_ch * roi_size * roi_size, fc_out),
            tnn.Linear(fc_out, fc_out)])
        self.fc_cls = tnn.Linear(fc_out, num_classes)
        self.fc_reg = tnn.Linear(fc_out, 4 * num_classes)

    def forward(self, x):  # x: (R, C, S, S)
        x = x.flatten(1)
        for fc in self.shared_fcs:
            x = F.relu(fc(x))
        return self.fc_cls(x), self.fc_reg(x)


class TorchFCNMaskHead(tnn.Module):
    """mmdet v1 FCNMaskHead: 4x conv+relu, deconv 2x2 s2 + relu, 1x1 logits
    with num_classes channels INCLUDING the never-used bg channel 0."""

    def __init__(self, in_ch=FEAT, num_classes=NUM_CLASSES):
        super().__init__()
        self.convs = tnn.ModuleList(
            [ConvModule(in_ch, in_ch, 3, padding=1) for _ in range(4)])
        self.upsample = tnn.ConvTranspose2d(in_ch, in_ch, 2, stride=2)
        self.conv_logits = tnn.Conv2d(in_ch, num_classes, 1)

    def forward(self, x):
        for m in self.convs:
            x = F.relu(m.conv(x))
        x = F.relu(self.upsample(x))
        return self.conv_logits(x)


class TorchFasterRCNN(tnn.Module):
    def __init__(self):
        super().__init__()
        self.backbone = TorchResNet18()
        self.neck = TorchFPN4()
        self.rpn_head = TorchRPNHead()
        self.bbox_head = TorchSharedFCBBoxHead()


class TorchMaskRCNN(TorchFasterRCNN):
    def __init__(self):
        super().__init__()
        self.mask_head = TorchFCNMaskHead()


def _shrink(m):
    with torch.no_grad():
        for mod in m.modules():
            if isinstance(mod, tnn.BatchNorm2d):
                mod.running_mean.uniform_(-0.5, 0.5)
                mod.running_var.uniform_(0.5, 2.0)
                mod.weight.uniform_(0.5, 1.5)
                mod.bias.uniform_(-0.5, 0.5)
            elif isinstance(mod, (tnn.Conv2d, tnn.ConvTranspose2d)):
                mod.weight.mul_(0.3)
    m.eval()
    return m


@pytest.fixture(scope="module")
def torch_det():
    torch.manual_seed(11)
    return _shrink(TorchMaskRCNN())


def _flax_cfg(with_mask=False):
    cfg = dict(
        type="MaskRCNN" if with_mask else "FasterRCNN",
        backbone=dict(type="ResNet", depth=18, frozen_stages=-1,
                      norm_cfg=dict(type="FrozenBN")),
        neck=dict(type="FPN", in_channels=[64, 128, 256, 512],
                  out_channels=FEAT, num_outs=5),
        rpn_head=dict(type="RPNHead", num_classes=2, in_channels=FEAT,
                      feat_channels=FEAT, anchor_scales=(8,),
                      anchor_ratios=(0.5, 1.0, 2.0),
                      anchor_strides=(4, 8, 16, 32, 64)),
        bbox_roi_extractor=dict(type="SingleRoIExtractor",
                                out_channels=FEAT,
                                featmap_strides=(4, 8, 16, 32),
                                roi_layer=dict(out_size=7, sample_num=2)),
        bbox_head=dict(type="SharedFCBBoxHead", num_classes=NUM_CLASSES,
                       in_channels=FEAT, fc_out_channels=FEAT))
    if with_mask:
        cfg["mask_roi_extractor"] = dict(
            type="SingleRoIExtractor", out_channels=FEAT,
            featmap_strides=(4, 8, 16, 32),
            roi_layer=dict(out_size=14, sample_num=2))
        cfg["mask_head"] = dict(type="FCNMaskHead", num_convs=4,
                                in_channels=FEAT, conv_out_channels=FEAT,
                                num_classes=NUM_CLASSES)
    test_cfg = dict(rpn=dict(nms_pre=200, max_num=64, nms_thr=0.7),
                    rcnn=dict(score_thr=0.05, nms=dict(iou_thr=0.5),
                              max_per_img=20, mask_thr_binary=0.5))
    return cfg, test_cfg


class TestRPNParity:
    def test_rpn_logits_through_pyramid(self, torch_det):
        """backbone -> FPN(maxpool extra) -> RPN conv outputs must match at
        every level (validates convert_torch_resnet + convert_torch_fpn at
        num_laterals=4 + convert_torch_rpn_head together)."""
        import jax.numpy as jnp
        from ioudet.models import build_detector

        cfg, test_cfg = _flax_cfg()
        det = build_detector(cfg, None, test_cfg)
        params = convert_torch_faster_rcnn(
            torch_det.state_dict(), depth=18, num_laterals=4,
            head_in_channels=FEAT)

        rng = np.random.default_rng(3)
        x = rng.normal(0, 1, (1, 64, 96, 3)).astype(np.float32)
        with torch.no_grad():
            feats_t = torch_det.neck(torch_det.backbone(
                torch.from_numpy(np.transpose(x, (0, 3, 1, 2)))))
            cls_t, reg_t = torch_det.rpn_head(feats_t)
        cls_j, reg_j = det.apply({"params": params}, jnp.asarray(x))
        assert len(cls_j) == 5
        for lvl in range(5):
            for ours, theirs in ((cls_j[lvl], cls_t[lvl]),
                                 (reg_j[lvl], reg_t[lvl])):
                theirs = np.transpose(theirs.numpy(), (0, 2, 3, 1))
                np.testing.assert_allclose(np.asarray(ours), theirs,
                                           rtol=2e-3, atol=2e-3)


class TestBBoxHeadParity:
    def test_shared_fc_chw_flatten(self, torch_det):
        """The first shared fc crosses torch's channel-major flatten vs our
        spatial-major flatten — the exact silent-breakage spot VERDICT r4
        flags.  Random pooled RoI features through both heads must agree."""
        import jax.numpy as jnp
        from ioudet.models.bbox_heads.bbox_head import SharedFCBBoxHead

        rng = np.random.default_rng(5)
        roi = rng.normal(0, 1, (9, 7, 7, FEAT)).astype(np.float32)
        with torch.no_grad():
            cls_t, reg_t = torch_det.bbox_head(
                torch.from_numpy(np.transpose(roi, (0, 3, 1, 2))))
        head = SharedFCBBoxHead(num_classes=NUM_CLASSES, in_channels=FEAT,
                                fc_out_channels=FEAT)
        params = convert_torch_shared_fc_bbox_head(
            torch_det.bbox_head.state_dict(), roi_feat_size=7,
            in_channels=FEAT)
        cls_j, reg_j = head.apply({"params": params}, jnp.asarray(roi))
        np.testing.assert_allclose(np.asarray(cls_j), cls_t.numpy(),
                                   rtol=1e-4, atol=1e-4)
        np.testing.assert_allclose(np.asarray(reg_j), reg_t.numpy(),
                                   rtol=1e-4, atol=1e-4)

    def test_chw_permute_is_load_bearing(self, torch_det):
        """Sanity that the test can fail: skipping the CHW->HWC permute on
        the first fc must NOT match (guards against a trivially-true test)."""
        import jax.numpy as jnp
        from ioudet.apis.checkpoint import _t2np
        from ioudet.models.bbox_heads.bbox_head import SharedFCBBoxHead

        rng = np.random.default_rng(5)
        roi = rng.normal(0, 1, (9, 7, 7, FEAT)).astype(np.float32)
        with torch.no_grad():
            cls_t, _ = torch_det.bbox_head(
                torch.from_numpy(np.transpose(roi, (0, 3, 1, 2))))
        params = convert_torch_shared_fc_bbox_head(
            torch_det.bbox_head.state_dict(), roi_feat_size=7,
            in_channels=FEAT)
        # overwrite fc0 with the UN-permuted torch weight
        params["shared_fc0"]["kernel"] = \
            _t2np(torch_det.bbox_head.shared_fcs[0].weight).T.copy()
        head = SharedFCBBoxHead(num_classes=NUM_CLASSES, in_channels=FEAT,
                                fc_out_channels=FEAT)
        cls_j, _ = head.apply({"params": params}, jnp.asarray(roi))
        assert np.abs(np.asarray(cls_j) - cls_t.numpy()).max() > 1e-3


class TestMaskHeadParity:
    def test_fcn_mask_head(self, torch_det):
        """Deconv flip + bg-channel drop: torch mask logits channels 1..C-1
        must equal our C-1 channels exactly."""
        import jax.numpy as jnp
        from ioudet.models.mask_heads.fcn_mask_head import FCNMaskHead

        rng = np.random.default_rng(7)
        roi = rng.normal(0, 1, (6, 14, 14, FEAT)).astype(np.float32)
        with torch.no_grad():
            logits_t = torch_det.mask_head(
                torch.from_numpy(np.transpose(roi, (0, 3, 1, 2))))
        head = FCNMaskHead(num_convs=4, in_channels=FEAT,
                           conv_out_channels=FEAT, num_classes=NUM_CLASSES)
        params = convert_torch_fcn_mask_head(
            torch_det.mask_head.state_dict())
        logits_j = head.apply({"params": params}, jnp.asarray(roi))
        theirs = np.transpose(logits_t.numpy(), (0, 2, 3, 1))[..., 1:]
        assert logits_j.shape == theirs.shape  # (6, 28, 28, C-1)
        np.testing.assert_allclose(np.asarray(logits_j), theirs,
                                   rtol=1e-4, atol=1e-4)


class TestFullTreeLoad:
    @pytest.mark.parametrize("with_mask", [False, True])
    def test_converted_tree_matches_init_and_runs(self, torch_det,
                                                  with_mask):
        """Converted tree must be structurally identical to det.init's (so
        load_from/resume work) and simple_test on it must produce finite,
        fixed-shape detections."""
        import jax
        import jax.numpy as jnp
        from ioudet.models import build_detector

        cfg, test_cfg = _flax_cfg(with_mask)
        det = build_detector(cfg, None, test_cfg)
        if with_mask:
            params = convert_torch_mask_rcnn(
                torch_det.state_dict(), depth=18, num_laterals=4,
                head_in_channels=FEAT)
        else:
            params = convert_torch_faster_rcnn(
                torch_det.state_dict(), depth=18, num_laterals=4,
                head_in_channels=FEAT)
        init_params = det.init(
            jax.random.PRNGKey(0), jnp.zeros((1, 64, 96, 3)),
            jnp.asarray([[64, 96]], jnp.int32), jnp.ones((1,), jnp.float32),
            jnp.asarray([[64, 96]], jnp.int32),
            method=det.simple_test)["params"]
        init_paths = {jax.tree_util.keystr(p): v.shape for p, v in
                      jax.tree_util.tree_leaves_with_path(init_params)}
        conv_paths = {jax.tree_util.keystr(p): np.shape(v) for p, v in
                      jax.tree_util.tree_leaves_with_path(params)}
        assert init_paths == conv_paths

        img_shapes = jnp.asarray([[64, 96]], jnp.int32)
        pad_shapes = jnp.asarray([[64, 96]], jnp.int32)
        sf = jnp.ones((1,), jnp.float32)
        rng = np.random.default_rng(9)
        img = jnp.asarray(rng.normal(0, 1, (1, 64, 96, 3)), jnp.float32)
        out = det.apply({"params": params}, img, img_shapes, sf, pad_shapes,
                        method=det.simple_test)
        dets = out[0] if isinstance(out, tuple) else out
        assert np.isfinite(np.asarray(dets)).all()
