"""Two-stage TTA (VERDICT r2 item 4): merge_aug_proposals /
merge_aug_bboxes_mean / merge_aug_masks unit semantics + aug_test_two_stage
end-to-end for Faster R-CNN, Mask R-CNN and Cascade R-CNN.

Ref: mmdet/core/post_processing/merge_augs.py (merge_aug_proposals,
merge_aug_bboxes, merge_aug_masks) + mmdet/models/detectors/test_mixins.py
(aug_test_bboxes, aug_test_mask)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from ioudet.core.post_processing import (merge_aug_bboxes_mean,
                                         merge_aug_masks,
                                         merge_aug_proposals)
from ioudet.models import build_detector


# ------------------------------------------------------------------ units

class TestMergeAugProposals:
    def test_flip_and_scale_map_back_then_nms(self):
        # view A: identity.  Two disjoint proposals.
        props_a = jnp.asarray([[0.0, 0.0, 10.0, 10.0, 0.9],
                               [20.0, 20.0, 30.0, 30.0, 0.8]])
        meta_a = dict(img_shape=(50, 40), scale_factor=1.0, flip=False)
        # view B: flipped, W=40.  x1 = W - x2 - 1 -> this box maps back
        # exactly onto A's first proposal, with a higher score.
        props_b = jnp.asarray([[29.0, 0.0, 39.0, 10.0, 0.95]])
        meta_b = dict(img_shape=(50, 40), scale_factor=1.0, flip=True)
        # view C: 2x scale.  Maps back onto [12, 12, 16, 16].
        props_c = jnp.asarray([[24.0, 24.0, 32.0, 32.0, 0.7]])
        meta_c = dict(img_shape=(100, 80), scale_factor=2.0, flip=False)

        merged = np.asarray(merge_aug_proposals(
            [props_a, props_b, props_c], [meta_a, meta_b, meta_c],
            dict(nms_thr=0.5, max_num=4)))
        assert merged.shape == (4, 5)
        # score order: 0.95 (flip-mapped winner), 0.8, 0.7; the 0.9 duplicate
        # was suppressed by the merged NMS; slot 4 is zero padding
        np.testing.assert_allclose(merged[0],
                                   [0.0, 0.0, 10.0, 10.0, 0.95], atol=1e-5)
        np.testing.assert_allclose(merged[1],
                                   [20.0, 20.0, 30.0, 30.0, 0.8], atol=1e-5)
        np.testing.assert_allclose(merged[2], [12.0, 12.0, 16.0, 16.0, 0.7],
                                   atol=1e-5)
        np.testing.assert_allclose(merged[3, 4], 0.0)

    def test_padding_slots_do_not_survive(self):
        props = jnp.asarray([[5.0, 5.0, 9.0, 9.0, 0.5],
                             [0.0, 0.0, 0.0, 0.0, 0.0]])  # padded slot
        meta = dict(img_shape=(20, 20), scale_factor=1.0, flip=False)
        merged = np.asarray(merge_aug_proposals([props], [meta],
                                                dict(nms_thr=0.7, max_num=2)))
        assert merged[0, 4] == pytest.approx(0.5)
        assert merged[1, 4] == 0.0


class TestMergeAugBboxesMean:
    def test_mean_after_map_back(self):
        # aligned 1:1 proposals; view B flipped with slight offset
        boxes_a = jnp.asarray([[[10.0, 10.0, 20.0, 20.0]]])  # (1, 1, 4)
        boxes_b_unflipped = np.array([[12.0, 10.0, 22.0, 20.0]])
        W = 40
        boxes_b = jnp.asarray(
            [[[W - boxes_b_unflipped[0, 2] - 1, 10.0,
               W - boxes_b_unflipped[0, 0] - 1, 20.0]]])
        scores_a = jnp.asarray([[0.6]])
        scores_b = jnp.asarray([[0.8]])
        metas = [dict(img_shape=(50, 40), scale_factor=1.0, flip=False),
                 dict(img_shape=(50, 40), scale_factor=1.0, flip=True)]
        mb, ms = merge_aug_bboxes_mean([boxes_a, boxes_b],
                                       [scores_a, scores_b], metas)
        np.testing.assert_allclose(np.asarray(mb)[0, 0],
                                   [11.0, 10.0, 21.0, 20.0], atol=1e-5)
        np.testing.assert_allclose(np.asarray(ms)[0], [0.7], atol=1e-6)


class TestMergeAugMasks:
    def test_flip_mirrored_back_before_average(self):
        rng = np.random.default_rng(0)
        base = rng.uniform(size=(3, 8, 8)).astype(np.float32)
        views = [jnp.asarray(base), jnp.asarray(base[..., ::-1].copy())]
        metas = [dict(flip=False), dict(flip=True)]
        merged = np.asarray(merge_aug_masks(views, metas))
        np.testing.assert_allclose(merged, base, atol=1e-6)

    def test_weights(self):
        a = jnp.ones((1, 4, 4)) * 0.2
        b = jnp.ones((1, 4, 4)) * 0.8
        metas = [dict(flip=False), dict(flip=False)]
        merged = np.asarray(merge_aug_masks([a, b], metas, weights=[3, 1]))
        np.testing.assert_allclose(merged, 0.35, atol=1e-6)


# ------------------------------------------------------------ end to end

def _faster_cfg():
    return dict(
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


TEST_CFG = dict(rpn=dict(nms_pre=100, max_num=32, nms_thr=0.7),
                rcnn=dict(score_thr=0.05, nms=dict(iou_thr=0.5),
                          max_per_img=10))


def _init_params(det, img, canvas):
    shapes = jnp.asarray([list(canvas)], jnp.int32)
    variables = det.init(jax.random.PRNGKey(0), img, shapes,
                         jnp.ones((1,), jnp.float32), shapes,
                         method=det.simple_test)
    return variables["params"]


def _view(img, canvas, flip=False, scale=1.0):
    return dict(img=np.asarray(img[0]),
                img_shape=np.asarray(list(canvas), np.int32),
                scale_factor=np.float32(scale),
                pad_shape=np.asarray(list(canvas), np.int32),
                flip=flip)


class TestAugTestTwoStage:
    canvas = (64, 96)

    def _img(self, seed=0):
        rng = np.random.default_rng(seed)
        return jnp.asarray(rng.normal(0, 1, (1,) + self.canvas + (3,)),
                           jnp.float32)

    def test_identity_views_match_simple_test(self):
        """Two identical identity views: the merged TTA result must equal
        the plain simple_test result (duplicate proposals dedup at IoU=1,
        averaged scores of identical views are unchanged)."""
        from ioudet.apis.test import aug_test_two_stage
        det = build_detector(_faster_cfg(), None, dict(TEST_CFG))
        img = self._img()
        params = _init_params(det, img, self.canvas)
        shapes = jnp.asarray([list(self.canvas)], jnp.int32)
        dets_s, labels_s = det.apply(
            {"params": params}, img, shapes, jnp.ones((1,), jnp.float32),
            shapes, method=det.simple_test)
        dets_s, labels_s = np.asarray(dets_s)[0], np.asarray(labels_s)[0]

        samples = [_view(img, self.canvas), _view(img, self.canvas)]
        dets_a, labels_a = aug_test_two_stage(det, params, samples,
                                              dict(TEST_CFG))

        keep_s = labels_s >= 0
        keep_a = labels_a >= 0
        assert keep_s.sum() > 0
        assert keep_s.sum() == keep_a.sum()
        # same detection set (allow reordering of equal-score rows)
        rows_s = sorted(map(tuple, np.round(
            np.concatenate([dets_s[keep_s], labels_s[keep_s, None]], 1),
            3).tolist()))
        rows_a = sorted(map(tuple, np.round(
            np.concatenate([dets_a[keep_a], labels_a[keep_a, None]], 1),
            3).tolist()))
        np.testing.assert_allclose(np.asarray(rows_a), np.asarray(rows_s),
                                   atol=2e-3)

    def test_flip_view_runs_and_merges(self):
        """identity + genuinely flipped image view: merged output is
        well-formed, and every returned box lies inside the image."""
        from ioudet.apis.test import aug_test_two_stage
        det = build_detector(_faster_cfg(), None, dict(TEST_CFG))
        img = self._img(1)
        params = _init_params(det, img, self.canvas)
        flipped = jnp.asarray(np.asarray(img)[:, :, ::-1, :].copy())
        samples = [_view(img, self.canvas),
                   _view(flipped, self.canvas, flip=True)]
        dets, labels = aug_test_two_stage(det, params, samples,
                                          dict(TEST_CFG))
        assert dets.shape == (10, 5) and labels.shape == (10,)
        keep = labels >= 0
        assert np.isfinite(dets[keep]).all()
        if keep.any():
            d = dets[keep]
            assert (d[:, 0] >= -1e-3).all() and (d[:, 1] >= -1e-3).all()
            assert (d[:, 2] <= self.canvas[1]).all()
            assert (d[:, 3] <= self.canvas[0]).all()

    def test_mask_rcnn_tta_masks(self):
        from ioudet.apis.test import aug_test_two_stage
        cfg = dict(_faster_cfg(), type="MaskRCNN",
                   mask_roi_extractor=dict(
                       type="SingleRoIExtractor", out_channels=64,
                       featmap_strides=(4, 8, 16, 32),
                       roi_layer=dict(out_size=14, sample_num=2)),
                   mask_head=dict(type="FCNMaskHead", num_convs=2,
                                  in_channels=64, conv_out_channels=64,
                                  num_classes=5))
        det = build_detector(cfg, None, dict(TEST_CFG))
        img = self._img(2)
        params = _init_params(det, img, self.canvas)
        flipped = jnp.asarray(np.asarray(img)[:, :, ::-1, :].copy())
        samples = [_view(img, self.canvas),
                   _view(flipped, self.canvas, flip=True)]
        out = aug_test_two_stage(det, params, samples, dict(TEST_CFG))
        assert len(out) == 3
        dets, labels, masks = out
        assert masks.shape[0] == dets.shape[0]
        assert masks.shape[1:] == (28, 28)
        assert np.isfinite(masks).all()
        assert (masks >= 0).all() and (masks <= 1).all()

    def test_cascade_tta_identity_views_match_simple_test(self):
        from ioudet.apis.test import aug_test_two_stage
        base = _faster_cfg()
        cfg = dict(
            type="CascadeRCNN", num_stages=2,
            stage_loss_weights=(1.0, 0.5), stage_pos_thrs=(0.5, 0.6),
            backbone=base["backbone"], neck=base["neck"],
            rpn_head=base["rpn_head"],
            bbox_roi_extractor=base["bbox_roi_extractor"],
            bbox_head=[dict(type="SharedFCBBoxHead", num_classes=5,
                            in_channels=64, fc_out_channels=64,
                            target_stds=(0.1, 0.1, 0.2, 0.2)),
                       dict(type="SharedFCBBoxHead", num_classes=5,
                            in_channels=64, fc_out_channels=64,
                            target_stds=(0.05, 0.05, 0.1, 0.1))])
        det = build_detector(cfg, None, dict(TEST_CFG))
        img = self._img(3)
        params = _init_params(det, img, self.canvas)
        shapes = jnp.asarray([list(self.canvas)], jnp.int32)
        dets_s, labels_s = det.apply(
            {"params": params}, img, shapes, jnp.ones((1,), jnp.float32),
            shapes, method=det.simple_test)
        dets_s, labels_s = np.asarray(dets_s)[0], np.asarray(labels_s)[0]

        samples = [_view(img, self.canvas), _view(img, self.canvas)]
        dets_a, labels_a = aug_test_two_stage(det, params, samples,
                                              dict(TEST_CFG))
        keep_s, keep_a = labels_s >= 0, labels_a >= 0
        assert keep_s.sum() == keep_a.sum()
        rows_s = sorted(map(tuple, np.round(
            np.concatenate([dets_s[keep_s], labels_s[keep_s, None]], 1),
            3).tolist()))
        rows_a = sorted(map(tuple, np.round(
            np.concatenate([dets_a[keep_a], labels_a[keep_a, None]], 1),
            3).tolist()))
        np.testing.assert_allclose(np.asarray(rows_a), np.asarray(rows_s),
                                   atol=2e-3)
