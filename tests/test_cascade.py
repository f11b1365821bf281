"""Cascade R-CNN: per-stage losses, refinement flow, inference."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from ioudet.models import build_detector


def stage_head(stds):
    return dict(type="SharedFCBBoxHead", num_classes=5, in_channels=64,
                fc_out_channels=64, target_stds=stds)


@pytest.fixture(scope="module")
def cascade_setup():
    det = build_detector(dict(
        type="CascadeRCNN",
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
        bbox_head=[stage_head([0.1, 0.1, 0.2, 0.2]),
                   stage_head([0.05, 0.05, 0.1, 0.1]),
                   stage_head([0.033, 0.033, 0.067, 0.067])],
        num_stages=3),
        dict(rpn=dict(assigner=dict(type="MaxIoUAssigner", pos_iou_thr=0.7,
                                    neg_iou_thr=0.3, min_pos_iou=0.3),
                      allowed_border=0),
             rpn_proposal=dict(nms_pre=200, max_num=64, nms_thr=0.7),
             rcnn=dict(sampler=dict(num=32, pos_fraction=0.25))),
        dict(rpn=dict(nms_pre=100, max_num=32, nms_thr=0.7),
             rcnn=dict(score_thr=0.05, nms=dict(iou_thr=0.5), max_per_img=8)))
    rng = np.random.default_rng(0)
    B, G = 2, 3
    img = jnp.asarray(rng.normal(0, 1, (B, 64, 96, 3)), jnp.float32)
    xy = rng.uniform(0, 40, (B, G, 2)).astype(np.float32)
    batch = dict(img=img,
                 gt_bboxes=jnp.asarray(np.concatenate([xy, xy + 25], -1)),
                 gt_labels=jnp.asarray(rng.integers(1, 5, (B, G)), jnp.int32),
                 gt_valid=jnp.ones((B, G), bool),
                 img_shape=jnp.tile(jnp.asarray([[64, 96]], jnp.int32), (B, 1)))
    variables = det.init(
        {"params": jax.random.PRNGKey(0), "sampler": jax.random.PRNGKey(7)},
        img, batch["gt_bboxes"], batch["gt_labels"], batch["gt_valid"],
        batch["img_shape"], batch["img_shape"], method=det.forward_train)
    return det, variables, batch


class TestCascade:
    def test_per_stage_losses(self, cascade_setup):
        det, variables, batch = cascade_setup
        losses = jax.jit(lambda v, b: det.apply(
            v, b["img"], b["gt_bboxes"], b["gt_labels"], b["gt_valid"],
            b["img_shape"], b["img_shape"], method=det.forward_train,
            rngs={"sampler": jax.random.PRNGKey(1)}))(variables, batch)
        for s in range(3):
            assert f"s{s}_loss_cls" in losses and f"s{s}_loss_bbox" in losses
        assert all(np.isfinite(float(v)) for v in losses.values())

    def test_stage_heads_have_distinct_params(self, cascade_setup):
        det, variables, batch = cascade_setup
        p = variables["params"]
        heads = [k for k in p if k.startswith("bbox_head")]
        assert len(heads) == 3

    def test_simple_test(self, cascade_setup):
        det, variables, batch = cascade_setup
        dets, labels = jax.jit(lambda v, b: det.apply(
            v, b["img"], b["img_shape"], jnp.ones((2,)), b["img_shape"],
            method=det.simple_test))(variables, batch)
        assert dets.shape == (2, 8, 5)
        assert np.isfinite(np.asarray(dets)).all()
