"""GA-Faster R-CNN: guided-anchoring RPN proposals feeding the two-stage
head (ref: configs/guided_anchoring/ga_faster_r50_caffe_fpn_1x.py,
mmdet/models/detectors/faster_rcnn.py with GARPNHead)."""

import numpy as np
import jax
import jax.numpy as jnp

from ioudet.models import build_detector


def _det():
    return build_detector(dict(
        type="FasterRCNN",
        backbone=dict(type="ResNet", depth=18, frozen_stages=1,
                      norm_cfg=dict(type="FrozenBN")),
        neck=dict(type="FPN", in_channels=[64, 128, 256, 512],
                  out_channels=64, num_outs=5),
        rpn_head=dict(type="GARPNHead", num_classes=2, in_channels=64,
                      feat_channels=64, octave_base_scale=8,
                      scales_per_octave=3, anchor_ratios=(0.5, 1.0, 2.0),
                      anchor_strides=(4, 8, 16, 32, 64),
                      anchoring_stds=(0.07, 0.07, 0.14, 0.14),
                      target_stds=(0.07, 0.07, 0.11, 0.11),
                      loss_cls=dict(type="CrossEntropyLoss",
                                    use_sigmoid=True, loss_weight=1.0),
                      loss_bbox=dict(type="SmoothL1Loss", beta=1.0,
                                     loss_weight=1.0)),
        bbox_roi_extractor=dict(type="SingleRoIExtractor", out_channels=64,
                                featmap_strides=(4, 8, 16, 32),
                                roi_layer=dict(out_size=7, sample_num=2)),
        bbox_head=dict(type="SharedFCBBoxHead", num_classes=5,
                       in_channels=64, fc_out_channels=64,
                       target_stds=(0.1, 0.1, 0.2, 0.2))),
        dict(rpn=dict(assigner=dict(type="MaxIoUAssigner", pos_iou_thr=0.7,
                                    neg_iou_thr=0.3, min_pos_iou=0.3),
                      ga_assigner=dict(pos_iou_thr=0.7, neg_iou_thr=0.3,
                                       min_pos_iou=0.3),
                      allowed_border=-1),
             rpn_proposal=dict(nms_pre=100, max_num=32, nms_thr=0.7),
             rcnn=dict(assigner=dict(pos_iou_thr=0.5, neg_iou_thr=0.5,
                                     min_pos_iou=0.5),
                       sampler=dict(num=16, pos_fraction=0.25))),
        dict(rpn=dict(nms_pre=100, max_num=32, nms_thr=0.7),
             rcnn=dict(score_thr=0.05, nms=dict(iou_thr=0.5),
                       max_per_img=8)))


def _batch(B=2, G=3, canvas=(64, 96)):
    rng = np.random.default_rng(0)
    xy = rng.uniform(0, 40, (B, G, 2)).astype(np.float32)
    return dict(
        img=jnp.asarray(rng.normal(0, 1, (B,) + canvas + (3,)), jnp.float32),
        gt_bboxes=jnp.asarray(np.concatenate([xy, xy + 25], -1)),
        gt_labels=jnp.asarray(rng.integers(1, 5, (B, G)), jnp.int32),
        gt_valid=jnp.ones((B, G), bool),
        img_shape=jnp.tile(jnp.asarray([list(canvas)], jnp.int32), (B, 1)))


def test_ga_faster_train_and_test():
    det = _det()
    b = _batch()
    variables = det.init(
        {"params": jax.random.PRNGKey(0), "sampler": jax.random.PRNGKey(1)},
        b["img"], b["gt_bboxes"], b["gt_labels"], b["gt_valid"],
        b["img_shape"], b["img_shape"], method=det.forward_train)
    losses = det.apply(variables, b["img"], b["gt_bboxes"], b["gt_labels"],
                       b["gt_valid"], b["img_shape"], b["img_shape"],
                       method=det.forward_train,
                       rngs={"sampler": jax.random.PRNGKey(2)})
    # GA RPN contributes loc/shape losses on top of the standard terms
    assert {"rpn_loss_cls", "rpn_loss_bbox", "rpn_loss_shape",
            "rpn_loss_loc", "loss_cls", "loss_bbox"} <= set(losses)
    for k, v in losses.items():
        assert np.isfinite(float(v)), (k, v)

    dets, labels = det.apply(
        variables, b["img"], b["img_shape"], jnp.ones((2,), jnp.float32),
        b["img_shape"], method=det.simple_test)
    assert dets.shape == (2, 8, 5) and labels.shape == (2, 8)
    assert np.isfinite(np.asarray(dets)).all()
