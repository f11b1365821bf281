"""Mask Scoring R-CNN: mask-IoU target math + end-to-end smoke."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from ioudet.models import build_detector
from ioudet.models.mask_heads import MaskIoUHead


class TestMaskIoUTarget:
    def test_perfect_overlap(self):
        m = jnp.ones((2, 28, 28))
        iou = MaskIoUHead.mask_iou_target(m, m)
        np.testing.assert_allclose(np.asarray(iou), 1.0)

    def test_half_overlap(self):
        pred = jnp.zeros((1, 28, 28)).at[:, :, :14].set(1.0)
        tgt = jnp.ones((1, 28, 28))
        iou = MaskIoUHead.mask_iou_target(pred, tgt)
        np.testing.assert_allclose(np.asarray(iou), 0.5, atol=0.02)

    def test_loss_zero_when_exact(self):
        iou_pred = jnp.asarray([[0.7, 0.2]])
        loss = MaskIoUHead.loss(iou_pred, jnp.asarray([0.7]),
                                jnp.asarray([1]), jnp.asarray([1.0]))
        assert float(loss) < 1e-9


class TestMaskIoUTargetRef:
    """Reference area-ratio rule (ref: maskiou_head.py (get_target,
    _get_area_ratio)): the denominator uses the FULL gt mask area, so a
    perfect prediction on a half-covering RoI scores 0.5, not 1."""

    def test_half_covering_roi_caps_iou(self):
        S = 28
        pred = jnp.ones((1, S, S))          # perfect in-RoI prediction
        tgt = jnp.ones((1, S, S))           # gt fills the whole RoI
        roi = jnp.asarray([[0., 0., 56., 28.]])   # half of the gt box
        gt = jnp.asarray([[0., 0., 56., 56.]])
        frac = jnp.asarray([1.0])           # gt mask fills its box
        iou = MaskIoUHead.mask_iou_target_ref(pred, tgt, roi, gt, frac)
        np.testing.assert_allclose(np.asarray(iou), 0.5, atol=1e-5)

    def test_full_covering_roi_perfect(self):
        S = 28
        pred = jnp.ones((1, S, S))
        tgt = jnp.ones((1, S, S))
        roi = jnp.asarray([[0., 0., 56., 56.]])
        gt = jnp.asarray([[0., 0., 56., 56.]])
        iou = MaskIoUHead.mask_iou_target_ref(pred, tgt, roi, gt,
                                              jnp.asarray([1.0]))
        np.testing.assert_allclose(np.asarray(iou), 1.0, atol=1e-5)

    def test_responds_to_mask_quality_not_box(self):
        """Same RoI geometry, degraded mask -> strictly lower target; the
        old gt-boxes-as-RoIs shortcut could not express this distinction."""
        S = 28
        tgt = jnp.ones((1, S, S))
        roi = jnp.asarray([[0., 0., 56., 56.]])
        gt = jnp.asarray([[0., 0., 56., 56.]])
        frac = jnp.asarray([1.0])
        good = MaskIoUHead.mask_iou_target_ref(
            jnp.ones((1, S, S)), tgt, roi, gt, frac)
        bad = MaskIoUHead.mask_iou_target_ref(
            jnp.zeros((1, S, S)).at[:, :S // 2].set(1.0), tgt, roi, gt, frac)
        assert float(bad[0]) < float(good[0]) - 0.3

    def test_empty_gt_is_zero(self):
        S = 28
        iou = MaskIoUHead.mask_iou_target_ref(
            jnp.ones((1, S, S)), jnp.zeros((1, S, S)),
            jnp.asarray([[0., 0., 28., 28.]]),
            jnp.asarray([[0., 0., 28., 28.]]), jnp.asarray([0.0]))
        np.testing.assert_allclose(np.asarray(iou), 0.0)


@pytest.fixture(scope="module")
def msrcnn():
    det = build_detector(dict(
        type="MaskScoringRCNN",
        backbone=dict(type="ResNet", depth=18, frozen_stages=1,
                      norm_cfg=dict(type="FrozenBN")),
        neck=dict(type="FPN", in_channels=[64, 128, 256, 512],
                  out_channels=64, num_outs=5),
        rpn_head=dict(type="RPNHead", num_classes=2, in_channels=64,
                      feat_channels=64, anchor_scales=(8,),
                      anchor_ratios=(0.5, 1.0, 2.0),
                      anchor_strides=(4, 8, 16, 32, 64),
                      loss_cls=dict(type="FocalLoss", use_sigmoid=True,
                                    gamma=2.0, alpha=0.25, loss_weight=1.0),
                      loss_bbox=dict(type="SmoothL1Loss", beta=0.11,
                                     loss_weight=1.0)),
        bbox_roi_extractor=dict(type="SingleRoIExtractor", out_channels=64,
                                featmap_strides=(4, 8, 16, 32),
                                roi_layer=dict(out_size=7, sample_num=2)),
        bbox_head=dict(type="SharedFCBBoxHead", num_classes=5, in_channels=64,
                       fc_out_channels=64),
        mask_roi_extractor=dict(type="SingleRoIExtractor", out_channels=64,
                                featmap_strides=(4, 8, 16, 32),
                                roi_layer=dict(out_size=14, sample_num=2)),
        mask_head=dict(type="FCNMaskHead", num_convs=2, in_channels=64,
                       conv_out_channels=64, num_classes=5),
        mask_iou_head=dict(type="MaskIoUHead", num_convs=2, num_fcs=1,
                           in_channels=64, conv_out_channels=64,
                           fc_out_channels=64, num_classes=5)),
        dict(rpn=dict(assigner=dict(type="MaxIoUAssigner", pos_iou_thr=0.7,
                                    neg_iou_thr=0.3, min_pos_iou=0.3),
                      allowed_border=0),
             rpn_proposal=dict(nms_pre=200, max_num=64, nms_thr=0.7),
             rcnn=dict(sampler=dict(num=32, pos_fraction=0.25))),
        dict(rpn=dict(nms_pre=100, max_num=32, nms_thr=0.7),
             rcnn=dict(score_thr=0.05, nms=dict(iou_thr=0.5), max_per_img=8)))
    rng = np.random.default_rng(0)
    B, G = 2, 3
    xy = rng.uniform(0, 40, (B, G, 2)).astype(np.float32)
    batch = dict(
        img=jnp.asarray(rng.normal(0, 1, (B, 64, 96, 3)), jnp.float32),
        gt_bboxes=jnp.asarray(np.concatenate([xy, xy + 25], -1)),
        gt_labels=jnp.asarray(rng.integers(1, 5, (B, G)), jnp.int32),
        gt_valid=jnp.ones((B, G), bool),
        gt_masks=jnp.asarray(
            (rng.uniform(size=(B, G, 112, 112)) > 0.4).astype(np.uint8)),
        img_shape=jnp.tile(jnp.asarray([[64, 96]], jnp.int32), (B, 1)))
    variables = det.init(
        {"params": jax.random.PRNGKey(0), "sampler": jax.random.PRNGKey(7)},
        batch["img"], batch["gt_bboxes"], batch["gt_labels"],
        batch["gt_valid"], batch["img_shape"], batch["img_shape"],
        batch["gt_masks"], method=det.forward_train)
    return det, variables, batch


class TestMaskScoringRCNN:
    def test_losses(self, msrcnn):
        det, variables, batch = msrcnn
        losses = jax.jit(lambda v, b: det.apply(
            v, b["img"], b["gt_bboxes"], b["gt_labels"], b["gt_valid"],
            b["img_shape"], b["img_shape"], b["gt_masks"],
            method=det.forward_train,
            rngs={"sampler": jax.random.PRNGKey(1)}))(variables, batch)
        assert "loss_mask_iou" in losses and "loss_mask" in losses
        assert all(np.isfinite(float(v)) for v in losses.values())

    def test_rescored_inference(self, msrcnn):
        det, variables, batch = msrcnn
        dets, labels, masks = jax.jit(lambda v, b: det.apply(
            v, b["img"], b["img_shape"], jnp.ones((2,)), b["img_shape"],
            method=det.simple_test))(variables, batch)
        assert dets.shape == (2, 8, 5) and masks.shape == (2, 8, 28, 28)
        s = np.asarray(dets)[..., 4]
        assert ((s >= 0) & (s <= 1)).all()
