"""Long-tail detector zoo: Double-Head R-CNN, Grid R-CNN, HTC.

Covers (a) forward_train produces finite per-branch losses, (b) simple_test
shape/finiteness, (c) grid-head target/decode round-trip correctness, and
(d) HTC's semantic/mask couplings actually fire (loss keys + param tree).
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from ioudet.models import build_detector


def _batch(rng, B=2, G=3, hw=(64, 96)):
    img = jnp.asarray(rng.normal(0, 1, (B, *hw, 3)), jnp.float32)
    xy = rng.uniform(0, 40, (B, G, 2)).astype(np.float32)
    return dict(
        img=img,
        gt_bboxes=jnp.asarray(np.concatenate([xy, xy + 25], -1)),
        gt_labels=jnp.asarray(rng.integers(1, 5, (B, G)), jnp.int32),
        gt_valid=jnp.ones((B, G), bool),
        img_shape=jnp.tile(jnp.asarray([[hw[0], hw[1]]], jnp.int32), (B, 1)))


def _common(num_classes=5, ch=64):
    return dict(
        backbone=dict(type="ResNet", depth=18, frozen_stages=1,
                      norm_cfg=dict(type="FrozenBN")),
        neck=dict(type="FPN", in_channels=[64, 128, 256, 512],
                  out_channels=ch, num_outs=5),
        rpn_head=dict(type="RPNHead", num_classes=2, in_channels=ch,
                      feat_channels=ch, anchor_scales=(8,),
                      anchor_ratios=(0.5, 1.0, 2.0),
                      anchor_strides=(4, 8, 16, 32, 64),
                      loss_cls=dict(type="FocalLoss", use_sigmoid=True,
                                    gamma=2.0, alpha=0.25, loss_weight=1.0),
                      loss_bbox=dict(type="SmoothL1Loss", beta=0.11,
                                     loss_weight=1.0)),
        bbox_roi_extractor=dict(type="SingleRoIExtractor", out_channels=ch,
                                featmap_strides=(4, 8, 16, 32),
                                roi_layer=dict(out_size=7, sample_num=2)))


TRAIN_CFG = dict(
    rpn=dict(assigner=dict(type="MaxIoUAssigner", pos_iou_thr=0.7,
                           neg_iou_thr=0.3, min_pos_iou=0.3),
             allowed_border=0),
    rpn_proposal=dict(nms_pre=200, max_num=64, nms_thr=0.7),
    rcnn=dict(sampler=dict(num=32, pos_fraction=0.25)))
TEST_CFG = dict(rpn=dict(nms_pre=100, max_num=32, nms_thr=0.7),
                rcnn=dict(score_thr=0.05, nms=dict(iou_thr=0.5),
                          max_per_img=8))


# ------------------------------------------------------------ Double-Head

@pytest.fixture(scope="module")
def double_head_setup():
    cfg = _common()
    cfg.update(
        type="DoubleHeadRCNN",
        bbox_head=dict(type="DoubleConvFCBBoxHead", num_convs=2, num_fcs=2,
                       num_classes=5, in_channels=64, conv_out_channels=128,
                       fc_out_channels=64, cls_loss_weight=2.0,
                       bbox_loss_weight=2.0, norm_cfg=dict(type="GN")))
    det = build_detector(cfg, TRAIN_CFG, TEST_CFG)
    batch = _batch(np.random.default_rng(0))
    variables = det.init(
        {"params": jax.random.PRNGKey(0), "sampler": jax.random.PRNGKey(7)},
        batch["img"], batch["gt_bboxes"], batch["gt_labels"],
        batch["gt_valid"], batch["img_shape"], batch["img_shape"],
        method=det.forward_train)
    return det, variables, batch


class TestDoubleHead:
    def test_train_losses(self, double_head_setup):
        det, variables, batch = double_head_setup
        losses = jax.jit(lambda v, b: det.apply(
            v, b["img"], b["gt_bboxes"], b["gt_labels"], b["gt_valid"],
            b["img_shape"], b["img_shape"], method=det.forward_train,
            rngs={"sampler": jax.random.PRNGKey(1)}))(variables, batch)
        assert {"loss_cls", "loss_bbox"} <= set(losses)
        assert all(np.isfinite(float(v)) for v in losses.values())

    def test_two_branches_exist(self, double_head_setup):
        det, variables, _ = double_head_setup
        head = variables["params"]["bbox_head"]
        assert "res_block" in head and "fc_branch0" in head
        assert "conv_branch0" in head and "conv_branch1" in head

    def test_simple_test(self, double_head_setup):
        det, variables, batch = double_head_setup
        dets, labels = jax.jit(lambda v, b: det.apply(
            v, b["img"], b["img_shape"], jnp.ones((2,)), b["img_shape"],
            method=det.simple_test))(variables, batch)
        assert dets.shape == (2, 8, 5)
        assert np.isfinite(np.asarray(dets)).all()


# ------------------------------------------------------------- Grid R-CNN

@pytest.fixture(scope="module")
def grid_setup():
    cfg = _common()
    cfg.update(
        type="GridRCNN",
        bbox_head=dict(type="SharedFCBBoxHead", num_classes=5,
                       in_channels=64, fc_out_channels=64),
        grid_roi_extractor=dict(type="SingleRoIExtractor", out_channels=64,
                                featmap_strides=(4, 8, 16, 32),
                                roi_layer=dict(out_size=14, sample_num=2)),
        grid_head=dict(type="GridHead", num_convs=2, in_channels=64,
                       point_feat_channels=8, conv_out_channels=72,
                       heatmap_size=56))
    det = build_detector(cfg, TRAIN_CFG, TEST_CFG)
    batch = _batch(np.random.default_rng(1))
    variables = det.init(
        {"params": jax.random.PRNGKey(0), "sampler": jax.random.PRNGKey(7)},
        batch["img"], batch["gt_bboxes"], batch["gt_labels"],
        batch["gt_valid"], batch["img_shape"], batch["img_shape"],
        method=det.forward_train)
    return det, variables, batch


class TestGridRCNN:
    def test_train_losses(self, grid_setup):
        det, variables, batch = grid_setup
        losses = jax.jit(lambda v, b: det.apply(
            v, b["img"], b["gt_bboxes"], b["gt_labels"], b["gt_valid"],
            b["img_shape"], b["img_shape"], method=det.forward_train,
            rngs={"sampler": jax.random.PRNGKey(1)}))(variables, batch)
        assert "loss_grid" in losses
        assert all(np.isfinite(float(v)) for v in losses.values())
        assert float(losses["loss_grid"]) > 0

    def test_simple_test_refines(self, grid_setup):
        det, variables, batch = grid_setup
        dets, labels = jax.jit(lambda v, b: det.apply(
            v, b["img"], b["img_shape"], jnp.ones((2,)), b["img_shape"],
            method=det.simple_test))(variables, batch)
        assert dets.shape == (2, 8, 5)
        d = np.asarray(dets)
        assert np.isfinite(d).all()
        # refined boxes stay inside the image
        assert (d[..., 0] >= 0).all() and (d[..., 2] <= 96).all()


def test_grid_targets_decode_roundtrip():
    """A perfect heatmap (argmax at each gt grid point) must decode back to
    the gt box up to one heatmap cell (56th of the extended RoI)."""
    from ioudet.models.mask_heads.grid_head import (GridHead, extend_box,
                                                    grid_points_of_box)
    head = GridHead(heatmap_size=56)
    gt = jnp.asarray([[10.0, 20.0, 74.0, 110.0]])
    roi = extend_box(gt, 2.0)
    targets, weights = head.get_targets(roi, gt)
    assert targets.shape == (1, 56, 56, 9)
    assert weights.shape == (1, 9) and bool(weights.all())
    # use the binary target disks themselves as "predicted" heatmaps
    logits = targets * 10.0 - 5.0
    decoded = np.asarray(head.get_bboxes(gt, logits, 2.0))[0]
    cell = np.asarray((roi[0, 2:] - roi[0, :2]) / 56)
    np.testing.assert_allclose(decoded, np.asarray(gt[0]),
                               atol=float(cell.max()) + 1e-3)


def test_grid_points_layout():
    from ioudet.models.mask_heads.grid_head import grid_points_of_box
    pts = np.asarray(grid_points_of_box(jnp.asarray([0.0, 0.0, 2.0, 4.0])))
    np.testing.assert_allclose(pts[0], [0, 0])     # top-left
    np.testing.assert_allclose(pts[4], [1, 2])     # center
    np.testing.assert_allclose(pts[8], [2, 4])     # bottom-right


def test_grid_out_of_roi_points_masked():
    from ioudet.models.mask_heads.grid_head import GridHead
    head = GridHead(heatmap_size=56)
    roi = jnp.asarray([[0.0, 0.0, 50.0, 50.0]])
    gt = jnp.asarray([[40.0, 40.0, 80.0, 80.0]])    # right/bottom points out
    _, weights = head.get_targets(roi, gt)
    w = np.asarray(weights)[0]
    assert w[0] == 1.0          # top-left inside
    assert w[8] == 0.0          # bottom-right outside


# -------------------------------------------------------------------- HTC

@pytest.fixture(scope="module")
def htc_setup():
    ch = 64
    cfg = _common(ch=ch)
    stage = lambda stds: dict(type="SharedFCBBoxHead", num_classes=5,
                              in_channels=ch, fc_out_channels=64,
                              target_stds=stds)
    cfg.update(
        type="HybridTaskCascade",
        num_stages=2,
        stage_loss_weights=(1.0, 0.5),
        stage_pos_thrs=(0.5, 0.6),
        bbox_head=[stage([0.1, 0.1, 0.2, 0.2]),
                   stage([0.05, 0.05, 0.1, 0.1])],
        mask_roi_extractor=dict(type="SingleRoIExtractor", out_channels=ch,
                                featmap_strides=(4, 8, 16, 32),
                                roi_layer=dict(out_size=14, sample_num=2)),
        mask_head=[dict(type="HTCMaskHead", num_convs=2, in_channels=ch,
                        conv_out_channels=ch, num_classes=5),
                   dict(type="HTCMaskHead", num_convs=2, in_channels=ch,
                        conv_out_channels=ch, num_classes=5)],
        semantic_roi_extractor=dict(type="SingleRoIExtractor",
                                    out_channels=ch, featmap_strides=(8,),
                                    roi_layer=dict(out_size=14,
                                                   sample_num=2)),
        semantic_head=dict(type="FusedSemanticHead", num_ins=5,
                           fusion_level=1, num_convs=2, in_channels=ch,
                           conv_out_channels=ch, num_classes=8,
                           loss_weight=0.2))
    det = build_detector(cfg, TRAIN_CFG, TEST_CFG)
    rng = np.random.default_rng(2)
    batch = _batch(rng)
    B, G = 2, 3
    batch["gt_masks"] = jnp.asarray(
        rng.integers(0, 2, (B, G, 28, 28)), jnp.uint8)
    batch["gt_semantic_seg"] = jnp.asarray(
        rng.integers(0, 8, (B, 8, 12)), jnp.int32)  # 64/8 x 96/8
    variables = det.init(
        {"params": jax.random.PRNGKey(0), "sampler": jax.random.PRNGKey(7)},
        batch["img"], batch["gt_bboxes"], batch["gt_labels"],
        batch["gt_valid"], batch["img_shape"], batch["img_shape"],
        batch["gt_masks"], gt_semantic_seg=batch["gt_semantic_seg"],
        method=det.forward_train)
    return det, variables, batch


class TestHTC:
    def test_train_losses(self, htc_setup):
        det, variables, batch = htc_setup
        losses = jax.jit(lambda v, b: det.apply(
            v, b["img"], b["gt_bboxes"], b["gt_labels"], b["gt_valid"],
            b["img_shape"], b["img_shape"], b["gt_masks"],
            gt_semantic_seg=b["gt_semantic_seg"],
            method=det.forward_train,
            rngs={"sampler": jax.random.PRNGKey(1)}))(variables, batch)
        for s in range(2):
            assert f"s{s}_loss_cls" in losses
            assert f"s{s}_loss_mask" in losses
        assert "loss_semantic_seg" in losses
        assert all(np.isfinite(float(v)) for v in losses.values())

    def test_mask_info_flow_params(self, htc_setup):
        """Stage-1 mask head must own a conv_res transfer conv; stage-0
        must not (it receives no upstream feature)."""
        det, variables, _ = htc_setup
        p = variables["params"]
        assert "conv_res" in p["mask_head_1"]
        assert "conv_res" not in p["mask_head_0"]

    def test_simple_test_masks(self, htc_setup):
        det, variables, batch = htc_setup
        dets, labels, masks = jax.jit(lambda v, b: det.apply(
            v, b["img"], b["img_shape"], jnp.ones((2,)), b["img_shape"],
            method=det.simple_test))(variables, batch)
        assert dets.shape == (2, 8, 5)
        assert masks.shape[:2] == (2, 8)
        m = np.asarray(masks)
        assert np.isfinite(m).all() and (m >= 0).all() and (m <= 1).all()

    def test_semantic_head_loss_ignores_255(self):
        from ioudet.models.mask_heads.fused_semantic_head import \
            FusedSemanticHead
        head = FusedSemanticHead(num_classes=4, loss_weight=1.0)
        logits = jnp.asarray(np.random.default_rng(0).normal(
            0, 1, (1, 4, 4, 4)), jnp.float32)
        gt = jnp.full((1, 4, 4), 255, jnp.int32)
        assert float(head.loss(logits, gt)) == 0.0
        gt2 = jnp.zeros((1, 4, 4), jnp.int32)
        assert float(head.loss(logits, gt2)) > 0.0
