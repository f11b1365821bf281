"""Faster R-CNN C4 (caffe) — shared ResLayer trunk end to end.

Ref: mmdet/models/detectors/two_stage.py (TwoStageDetector with
shared_head) + configs/faster_rcnn_r50_caffe_c4_1x.py: RPN and RoI
extraction on the single stride-16 C4 map, pooled 14x14 RoI features run
through res5 (ResLayer, stride 2) before an avg-pooled BBoxHead.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ioudet.models import build_detector


def c4_cfg():
    cfg = dict(
        type="FasterRCNN",
        backbone=dict(type="ResNet", depth=50, num_stages=3,
                      out_indices=(2,), style="caffe", frozen_stages=1,
                      strides=(1, 2, 2), norm_cfg=dict(type="FrozenBN")),
        shared_head=dict(type="ResLayer", depth=50, stage=3, stride=2,
                         style="caffe"),
        rpn_head=dict(type="RPNHead", num_classes=2, in_channels=1024,
                      feat_channels=64, anchor_scales=(2, 4, 8, 16, 32),
                      anchor_ratios=(0.5, 1.0, 2.0), anchor_strides=(16,),
                      loss_cls=dict(type="CrossEntropyLoss",
                                    use_sigmoid=True, loss_weight=1.0),
                      loss_bbox=dict(type="SmoothL1Loss", beta=1.0 / 9.0,
                                     loss_weight=1.0)),
        bbox_roi_extractor=dict(type="SingleRoIExtractor",
                                out_channels=1024, featmap_strides=(16,),
                                roi_layer=dict(out_size=14, sample_num=2)),
        bbox_head=dict(type="BBoxHead", with_avg_pool=True, roi_feat_size=7,
                       in_channels=2048, num_classes=5),
    )
    train_cfg = dict(
        rpn=dict(assigner=dict(type="MaxIoUAssigner", pos_iou_thr=0.7,
                               neg_iou_thr=0.3, min_pos_iou=0.3),
                 allowed_border=0),
        rpn_proposal=dict(nms_pre=100, max_num=32, nms_thr=0.7),
        rcnn=dict(assigner=dict(pos_iou_thr=0.5, neg_iou_thr=0.5,
                                min_pos_iou=0.5),
                  sampler=dict(num=16, pos_fraction=0.25)))
    test_cfg = dict(rpn=dict(nms_pre=60, max_num=32, nms_thr=0.7),
                    rcnn=dict(score_thr=0.05, nms=dict(iou_thr=0.5),
                              max_per_img=10))
    return cfg, train_cfg, test_cfg


@pytest.fixture(scope="module")
def setup():
    cfg, train_cfg, test_cfg = c4_cfg()
    det = build_detector(cfg, train_cfg, test_cfg)
    rng = np.random.default_rng(0)
    B, G, canvas = 1, 3, (64, 64)
    xy = rng.uniform(0, 40, (B, G, 2)).astype(np.float32)
    wh = rng.uniform(8, 24, (B, G, 2)).astype(np.float32)
    batch = dict(
        img=jnp.asarray(rng.normal(0, 1, (B,) + canvas + (3,)), jnp.float32),
        gt_bboxes=jnp.asarray(np.concatenate([xy, xy + wh], -1)),
        gt_labels=jnp.asarray(rng.integers(1, 5, (B, G)), jnp.int32),
        gt_valid=jnp.ones((B, G), bool),
        img_shape=jnp.tile(jnp.asarray([list(canvas)], jnp.int32), (B, 1)),
        pad_shape=jnp.tile(jnp.asarray([list(canvas)], jnp.int32), (B, 1)))
    variables = det.init(
        {"params": jax.random.PRNGKey(0), "sampler": jax.random.PRNGKey(9)},
        batch["img"], batch["gt_bboxes"], batch["gt_labels"],
        batch["gt_valid"], batch["img_shape"], batch["pad_shape"],
        method=det.forward_train)
    return det, variables, batch


def test_c4_param_tree_has_shared_res5(setup):
    det, variables, _ = setup
    p = variables["params"]
    assert "shared_head" in p and "layer4_block0" in p["shared_head"]
    # backbone stops at C4: no layer4 in the backbone tree
    assert "layer4_0" not in p["backbone"]


def test_c4_train_losses_finite(setup):
    det, variables, b = setup
    losses = jax.jit(lambda v, bb: det.apply(
        v, bb["img"], bb["gt_bboxes"], bb["gt_labels"], bb["gt_valid"],
        bb["img_shape"], bb["pad_shape"], method=det.forward_train,
        rngs={"sampler": jax.random.PRNGKey(1)}))(variables, b)
    assert set(losses) == {"loss_cls", "loss_bbox", "rpn_loss_cls",
                           "rpn_loss_bbox"}
    assert all(np.isfinite(float(v)) for v in losses.values())


def test_c4_gradients_reach_shared_head(setup):
    det, variables, batch = setup

    def total(params):
        losses = det.apply({"params": params}, batch["img"],
                           batch["gt_bboxes"], batch["gt_labels"],
                           batch["gt_valid"], batch["img_shape"],
                           batch["pad_shape"], method=det.forward_train,
                           rngs={"sampler": jax.random.PRNGKey(2)})
        return sum(losses.values())

    grads = jax.jit(jax.grad(total))(variables["params"])
    g = grads["shared_head"]["layer4_block0"]["conv1"]["kernel"]
    assert float(jnp.abs(g).max()) > 0


def test_c4_simple_test_shapes(setup):
    det, variables, b = setup
    dets, labels = jax.jit(lambda v, bb: det.apply(
        v, bb["img"], bb["img_shape"], jnp.ones((1,)), bb["pad_shape"],
        method=det.simple_test))(variables, b)
    assert dets.shape == (1, 10, 5) and labels.shape == (1, 10)


def test_c4_config_builds_and_matches_reference_shape():
    from ioudet import Config
    import os
    cfg = Config.fromfile(os.path.join(os.path.dirname(__file__), "..",
                                       "configs",
                                       "faster_rcnn_r50_caffe_c4_1x.py"))
    det = build_detector(dict(cfg.model), cfg.get("train_cfg"),
                         cfg.get("test_cfg"))
    assert det.shared_head is not None
    assert det.neck is None
    assert det.backbone.style == "caffe"
