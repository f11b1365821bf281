"""Forward/loss/test smoke for the non-flagship detector families:
Faster R-CNN (two-stage), FCOS (anchor-free), SSD."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from ioudet.models import build_detector


def fake_batch(B=2, G=4, canvas=(64, 96), num_classes=5, seed=0):
    rng = np.random.default_rng(seed)
    xy = rng.uniform(0, 40, (B, G, 2)).astype(np.float32)
    return dict(
        img=jnp.asarray(rng.normal(0, 1, (B,) + canvas + (3,)), jnp.float32),
        gt_bboxes=jnp.asarray(np.concatenate([xy, xy + 20], -1)),
        gt_labels=jnp.asarray(rng.integers(1, num_classes, (B, G)), jnp.int32),
        gt_valid=jnp.ones((B, G), bool),
        img_shape=jnp.tile(jnp.asarray([list(canvas)], jnp.int32), (B, 1)),
        pad_shape=jnp.tile(jnp.asarray([list(canvas)], jnp.int32), (B, 1)),
    )


class TestFasterRCNN:
    @pytest.fixture(scope="class")
    def setup(self):
        cfg = dict(
            type="FasterRCNN",
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
                           in_channels=64, fc_out_channels=64))
        train_cfg = dict(
            rpn=dict(assigner=dict(type="MaxIoUAssigner", pos_iou_thr=0.7,
                                   neg_iou_thr=0.3, min_pos_iou=0.3),
                     allowed_border=0),
            rpn_proposal=dict(nms_pre=300, max_num=128, nms_thr=0.7),
            rcnn=dict(assigner=dict(pos_iou_thr=0.5, neg_iou_thr=0.5,
                                    min_pos_iou=0.5),
                      sampler=dict(num=64, pos_fraction=0.25)))
        test_cfg = dict(rpn=dict(nms_pre=200, max_num=64, nms_thr=0.7),
                        rcnn=dict(score_thr=0.05, nms=dict(iou_thr=0.5),
                                  max_per_img=20))
        det = build_detector(cfg, train_cfg, test_cfg)
        batch = fake_batch()
        variables = det.init(
            {"params": jax.random.PRNGKey(0), "sampler": jax.random.PRNGKey(9)},
            batch["img"], batch["gt_bboxes"], batch["gt_labels"],
            batch["gt_valid"], batch["img_shape"], batch["pad_shape"],
            method=det.forward_train)
        return det, variables, batch

    def test_train_losses(self, setup):
        det, variables, batch = setup
        losses = jax.jit(lambda v, b: det.apply(
            v, b["img"], b["gt_bboxes"], b["gt_labels"], b["gt_valid"],
            b["img_shape"], b["pad_shape"], method=det.forward_train,
            rngs={"sampler": jax.random.PRNGKey(1)}))(variables, batch)
        assert set(losses) == {"loss_cls", "loss_bbox", "rpn_loss_cls",
                               "rpn_loss_bbox"}
        assert all(np.isfinite(float(v)) for v in losses.values())

    def test_simple_test(self, setup):
        det, variables, batch = setup
        dets, labels = jax.jit(lambda v, b: det.apply(
            v, b["img"], b["img_shape"], jnp.ones((2,)), b["pad_shape"],
            method=det.simple_test))(variables, batch)
        assert dets.shape == (2, 20, 5) and labels.shape == (2, 20)
        lab = np.asarray(labels)
        assert ((lab >= -1) & (lab < 4)).all()

    def test_gradients_flow_to_both_stages(self, setup):
        det, variables, batch = setup

        def total(params):
            losses = det.apply({"params": params}, batch["img"],
                               batch["gt_bboxes"], batch["gt_labels"],
                               batch["gt_valid"], batch["img_shape"],
                               batch["pad_shape"], method=det.forward_train,
                               rngs={"sampler": jax.random.PRNGKey(2)})
            return sum(losses.values())

        grads = jax.jit(jax.grad(total))(variables["params"])
        g_rpn = grads["rpn_head"]["rpn_cls"]["kernel"]
        g_rcnn = grads["bbox_head"]["fc_cls"]["kernel"]
        assert float(jnp.abs(g_rpn).max()) > 0
        assert float(jnp.abs(g_rcnn).max()) > 0


class TestFCOS:
    @pytest.fixture(scope="class")
    def setup(self):
        cfg = dict(
            type="FCOS",
            backbone=dict(type="ResNet", depth=18, frozen_stages=1,
                          norm_cfg=dict(type="FrozenBN")),
            neck=dict(type="FPN", in_channels=[64, 128, 256, 512],
                      out_channels=32, start_level=1, add_extra_convs=True,
                      num_outs=5),
            bbox_head=dict(type="FCOSHead", num_classes=5, in_channels=32,
                           feat_channels=32, stacked_convs=1,
                           strides=(8, 16, 32, 64, 128)))
        test_cfg = dict(nms_pre=100, score_thr=0.05, nms=dict(iou_thr=0.5),
                        max_per_img=10)
        det = build_detector(cfg, dict(), test_cfg)
        batch = fake_batch()
        variables = det.init(jax.random.PRNGKey(0), batch["img"])
        return det, variables, batch

    def test_forward_shapes(self, setup):
        det, variables, batch = setup
        cls, box, ctr = det.apply(variables, batch["img"])
        assert len(cls) == 5
        assert cls[0].shape == (2, 8, 12, 4)
        assert box[0].shape == (2, 8, 12, 4)
        assert ctr[0].shape == (2, 8, 12, 1)
        assert (np.asarray(box[0]) > 0).all()  # exp-activated distances

    def test_loss_finite(self, setup):
        det, variables, batch = setup
        losses = jax.jit(lambda v, b: det.apply(
            v, b["img"], b["gt_bboxes"], b["gt_labels"], b["gt_valid"],
            b["img_shape"], b["pad_shape"], method=det.forward_train))(
                variables, batch)
        assert set(losses) == {"loss_cls", "loss_bbox", "loss_centerness"}
        for k, v in losses.items():
            assert np.isfinite(float(v)), (k, float(v))

    def test_simple_test(self, setup):
        det, variables, batch = setup
        dets, labels = jax.jit(lambda v, b: det.apply(
            v, b["img"], b["img_shape"], jnp.ones((2,)), b["pad_shape"],
            method=det.simple_test))(variables, batch)
        assert dets.shape == (2, 10, 5)


class TestSSD:
    @pytest.fixture(scope="class")
    def setup(self):
        cfg = dict(
            type="SSD",
            backbone=dict(type="SSDVGG", input_size=300),
            bbox_head=dict(type="SSDHead", num_classes=5,
                           input_size=300,
                           in_channels_list=(512, 1024, 512, 256, 256, 256),
                           anchor_strides=(8, 16, 32, 64, 100, 300),
                           basesize_ratio_range=(0.15, 0.9)))
        train_cfg = dict(assigner=dict(type="MaxIoUAssigner", pos_iou_thr=0.5,
                                       neg_iou_thr=0.5, min_pos_iou=0.0),
                         allowed_border=-1, pos_weight=-1)
        test_cfg = dict(nms_pre=100, score_thr=0.02, nms=dict(iou_thr=0.45),
                        max_per_img=10)
        det = build_detector(cfg, train_cfg, test_cfg)
        batch = fake_batch(B=1, canvas=(300, 300))
        variables = det.init(jax.random.PRNGKey(0), batch["img"])
        return det, variables, batch

    def test_forward_and_loss(self, setup):
        det, variables, batch = setup
        cls, box = det.apply(variables, batch["img"])
        assert len(cls) == 6
        losses = jax.jit(lambda v, b: det.apply(
            v, b["img"], b["gt_bboxes"], b["gt_labels"], b["gt_valid"],
            b["img_shape"], b["pad_shape"], method=det.forward_train))(
                variables, batch)
        assert all(np.isfinite(float(v)) for v in losses.values())

    def test_simple_test(self, setup):
        det, variables, batch = setup
        dets, labels = jax.jit(lambda v, b: det.apply(
            v, b["img"], b["img_shape"], jnp.ones((1,)), b["pad_shape"],
            method=det.simple_test))(variables, batch)
        assert dets.shape == (1, 10, 5)
