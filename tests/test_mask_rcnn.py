"""Mask R-CNN: box-frame mask representation, target resampling geometry,
and full train/test smoke."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from ioudet.core.mask import rasterize_polygons, crop_mask_to_roi, mask_target
from ioudet.models import build_detector


class TestMaskRepresentation:
    def test_rasterize_full_box_polygon(self):
        # polygon == box -> (nearly) full crop
        box = [10, 10, 50, 50]
        poly = [[10, 10, 50, 10, 50, 50, 10, 50]]
        m = rasterize_polygons(poly, box, out_size=32)
        assert m.shape == (32, 32)
        assert m.mean() > 0.85

    def test_rasterize_half_polygon(self):
        box = [0, 0, 40, 40]
        poly = [[0, 0, 40, 0, 40, 20, 0, 20]]  # top half
        m = rasterize_polygons(poly, box, out_size=32)
        assert m[:14].mean() > 0.9
        assert m[18:].mean() < 0.1

    def test_crop_identity(self):
        """RoI == gt box reproduces the crop (up to resampling)."""
        rng = np.random.default_rng(0)
        gt_mask = (rng.uniform(size=(112, 112)) > 0.5).astype(np.uint8)
        gt_box = jnp.asarray([10.0, 20.0, 66.0, 76.0])
        out = crop_mask_to_roi(jnp.asarray(gt_mask), gt_box, gt_box,
                               out_size=112)
        agree = (np.asarray(out > 0.5) == (gt_mask > 0)).mean()
        assert agree > 0.95

    def test_crop_offset_window(self):
        """An RoI covering the right half of the gt box samples the right
        half of the crop."""
        gt_mask = np.zeros((112, 112), np.uint8)
        gt_mask[:, 56:] = 1  # right half on
        gt_box = jnp.asarray([0.0, 0.0, 100.0, 100.0])
        roi = jnp.asarray([50.0, 0.0, 100.0, 100.0])
        out = np.asarray(crop_mask_to_roi(jnp.asarray(gt_mask), gt_box, roi,
                                          out_size=28))
        assert out.mean() > 0.9  # right half is fully inside the mask

    def test_mask_target_batched(self):
        gt_masks = jnp.ones((3, 112, 112), jnp.uint8)
        gt_boxes = jnp.asarray([[0, 0, 10, 10], [20, 20, 40, 40],
                                [5, 5, 9, 9]], jnp.float32)
        rois = jnp.asarray([[0, 0, 10, 10], [25, 25, 35, 35]], jnp.float32)
        t = mask_target(gt_masks, gt_boxes, rois,
                        jnp.asarray([0, 1]), jnp.asarray([True, True]),
                        out_size=14)
        assert t.shape == (2, 14, 14)
        np.testing.assert_allclose(np.asarray(t), 1.0, atol=1e-5)


class TestMaskRCNN:
    @pytest.fixture(scope="class")
    def setup(self):
        det = build_detector(dict(
            type="MaskRCNN",
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
            bbox_head=dict(type="SharedFCBBoxHead", num_classes=5,
                           in_channels=64, fc_out_channels=64),
            mask_roi_extractor=dict(type="SingleRoIExtractor", out_channels=64,
                                    featmap_strides=(4, 8, 16, 32),
                                    roi_layer=dict(out_size=14, sample_num=2)),
            mask_head=dict(type="FCNMaskHead", num_convs=2, in_channels=64,
                           conv_out_channels=64, num_classes=5)),
            dict(rpn=dict(assigner=dict(type="MaxIoUAssigner", pos_iou_thr=0.7,
                                        neg_iou_thr=0.3, min_pos_iou=0.3),
                          allowed_border=0),
                 rpn_proposal=dict(nms_pre=200, max_num=64, nms_thr=0.7),
                 rcnn=dict(assigner=dict(pos_iou_thr=0.5, neg_iou_thr=0.5,
                                         min_pos_iou=0.5),
                           sampler=dict(num=32, pos_fraction=0.25))),
            dict(rpn=dict(nms_pre=100, max_num=32, nms_thr=0.7),
                 rcnn=dict(score_thr=0.05, nms=dict(iou_thr=0.5),
                           max_per_img=8)))
        rng = np.random.default_rng(0)
        B, G = 2, 3
        img = jnp.asarray(rng.normal(0, 1, (B, 64, 96, 3)), jnp.float32)
        xy = rng.uniform(0, 40, (B, G, 2)).astype(np.float32)
        batch = dict(
            img=img,
            gt_bboxes=jnp.asarray(np.concatenate([xy, xy + 25], -1)),
            gt_labels=jnp.asarray(rng.integers(1, 5, (B, G)), jnp.int32),
            gt_valid=jnp.ones((B, G), bool),
            gt_masks=jnp.asarray(
                (rng.uniform(size=(B, G, 112, 112)) > 0.4).astype(np.uint8)),
            img_shape=jnp.tile(jnp.asarray([[64, 96]], jnp.int32), (B, 1)))
        variables = det.init(
            {"params": jax.random.PRNGKey(0), "sampler": jax.random.PRNGKey(7)},
            img, batch["gt_bboxes"], batch["gt_labels"], batch["gt_valid"],
            batch["img_shape"], batch["img_shape"], batch["gt_masks"],
            method=det.forward_train)
        return det, variables, batch

    def test_train_losses(self, setup):
        det, variables, batch = setup
        losses = jax.jit(lambda v, b: det.apply(
            v, b["img"], b["gt_bboxes"], b["gt_labels"], b["gt_valid"],
            b["img_shape"], b["img_shape"], b["gt_masks"],
            method=det.forward_train,
            rngs={"sampler": jax.random.PRNGKey(1)}))(variables, batch)
        assert "loss_mask" in losses
        assert all(np.isfinite(float(v)) for v in losses.values())
        assert float(losses["loss_mask"]) > 0

    def test_simple_test_returns_masks(self, setup):
        det, variables, batch = setup
        dets, labels, masks = jax.jit(lambda v, b: det.apply(
            v, b["img"], b["img_shape"], jnp.ones((2,)), b["img_shape"],
            method=det.simple_test))(variables, batch)
        assert dets.shape == (2, 8, 5)
        assert masks.shape == (2, 8, 28, 28)
        m = np.asarray(masks)
        assert ((m >= 0) & (m <= 1)).all()
