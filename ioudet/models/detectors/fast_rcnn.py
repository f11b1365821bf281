"""Fast R-CNN — the precomputed-proposal detector (ref:
mmdet/models/detectors/fast_rcnn.py (FastRCNN) + test_mixins.py box/mask
test paths).

No RPN: proposals arrive from the data pipeline (LoadProposals reads the
dataset's ``proposal_file``; Resize/RandomFlip transform them alongside the
GT boxes) as a fixed-shape (B, P, 4) tensor + (B, P) validity mask.
Training samples RoIs from those proposals with the same rank-based
fixed-shape sampler as the two-stage family; testing scores/refines them and
runs one multiclass NMS.  FastMaskRCNN adds the FCN mask branch (ref:
configs/fast_mask_rcnn_r50_fpn_1x.py).
"""

from __future__ import annotations

from typing import Any, Optional

import flax.linen as nn
import jax
import jax.numpy as jnp

from ...core.bbox import MaxIoUAssigner
from ...core.mask import mask_target
from ...core.post_processing import multiclass_nms
from ..bbox_heads.bbox_head import bbox_target_single
from ..heads.anchor_head import clip_boxes
from ..registry import DETECTORS
from .two_stage import TwoStageDetector, sample_rois_batch


@DETECTORS.register_module
class FastRCNN(nn.Module):
    backbone: nn.Module
    bbox_roi_extractor: nn.Module
    bbox_head: nn.Module
    neck: Optional[nn.Module] = None
    train_cfg: Any = None
    test_cfg: Any = None

    # APIs (train step / eval loop) feed `proposals`/`prop_valid` from the
    # batch when this is set (ioudet/apis/{train,test}.py)
    requires_proposals = True

    def extract_feat(self, img, train: bool = False):
        x = self.backbone(img, train=train)
        if self.neck is not None:
            x = self.neck(x, train=train)
        return x

    def __call__(self, img, train: bool = False):
        return self.extract_feat(img, train=train)

    # ------------------------------------------------------------------ train

    def forward_train(self, img, gt_bboxes, gt_labels, gt_valid,
                      img_shapes, pad_shapes, proposals=None,
                      prop_valid=None, rng=None, gt_bboxes_ignore=None,
                      gt_ignore_valid=None, gt_masks=None):
        assert proposals is not None, \
            "FastRCNN needs pipeline proposals (LoadProposals)"
        tcfg = dict(self.train_cfg or {})
        rcnn_cfg = dict(tcfg.get("rcnn", {}))
        feats = self.extract_feat(img, train=True)

        sampler_cfg = dict(rcnn_cfg.get("sampler", {}))
        num_samples = sampler_cfg.get("num", 512)
        pos_fraction = sampler_cfg.get("pos_fraction", 0.25)
        assigner = MaxIoUAssigner(**{k: v for k, v in dict(
            rcnn_cfg.get("assigner", dict(pos_iou_thr=0.5, neg_iou_thr=0.5,
                                          min_pos_iou=0.5))).items()
            if k != "type"})
        if rng is None:
            rng = self.make_rng("sampler") if self.has_rng("sampler") else \
                jax.random.PRNGKey(0)
        if prop_valid is None:
            prop_valid = jnp.ones(proposals.shape[:2], bool)
        sel_boxes, sel_pos, sel_valid, matched_gt, labels, gt_idx = \
            sample_rois_batch(rng, proposals, prop_valid, gt_bboxes,
                              gt_valid, gt_labels, assigner, num_samples,
                              pos_fraction, sampler_cfg=sampler_cfg)

        rois = TwoStageDetector._to_rois(sel_boxes)
        roi_feats = self.bbox_roi_extractor(feats[:4], rois)
        cls_score, bbox_pred = self.bbox_head(roi_feats, train=True)
        flat = lambda x: x.reshape((-1,) + x.shape[2:])
        labels_f, bbox_t, bbox_w = bbox_target_single(
            flat(sel_boxes), flat(sel_pos), flat(matched_gt), flat(labels),
            self.bbox_head.target_means, self.bbox_head.target_stds)
        losses = self.bbox_head.loss(cls_score, bbox_pred, labels_f,
                                     flat(sel_valid).astype(jnp.float32),
                                     bbox_t, bbox_w)
        losses.update(self._mask_losses(feats, rois, sel_boxes, sel_pos,
                                        gt_idx, labels_f, gt_bboxes,
                                        gt_masks))
        return losses

    def _mask_losses(self, feats, rois, sel_boxes, sel_pos, gt_idx,
                     labels_f, gt_bboxes, gt_masks):
        return {}  # box-only; FastMaskRCNN overrides

    # ------------------------------------------------------------------ test

    def simple_test(self, img, img_shapes, scale_factors, pad_shapes,
                    proposals=None, prop_valid=None, rescale: bool = True):
        assert proposals is not None
        cfg = dict(self.test_cfg or {})
        rcnn_cfg = dict(cfg.get("rcnn", dict(score_thr=0.05,
                                             nms=dict(iou_thr=0.5),
                                             max_per_img=100)))
        feats = self.extract_feat(img)
        B, P = proposals.shape[:2]
        if prop_valid is None:
            prop_valid = jnp.ones((B, P), bool)
        rois = TwoStageDetector._to_rois(proposals)
        roi_feats = self.bbox_roi_extractor(feats[:4], rois)
        cls_score, bbox_pred = self.bbox_head(roi_feats)
        num_classes = self.bbox_head.num_classes
        scores = jax.nn.softmax(cls_score, axis=-1)[:, 1:]
        from ...core.bbox import delta2bbox
        boxes = delta2bbox(rois[:, 1:], bbox_pred,
                           self.bbox_head.target_means,
                           self.bbox_head.target_stds)
        boxes = boxes.reshape(B, P, num_classes, 4)[:, :, 1:, :]
        scores = scores.reshape(B, P, num_classes - 1)

        def single(b, s, img_shape, sf, pv):
            b = clip_boxes(b, img_shape)
            if rescale:
                b = b / sf
            return multiclass_nms(
                b.reshape(P, (num_classes - 1) * 4), s,
                score_thr=rcnn_cfg.get("score_thr", 0.05),
                iou_thr=rcnn_cfg.get("nms", {}).get("iou_thr", 0.5),
                max_per_img=rcnn_cfg.get("max_per_img", 100),
                valid=pv)

        return jax.vmap(single)(boxes, scores, img_shapes, scale_factors,
                                prop_valid)


@DETECTORS.register_module
class FastMaskRCNN(FastRCNN):
    """Fast R-CNN + FCN mask branch on precomputed proposals (ref:
    configs/fast_mask_rcnn_r50_fpn_1x.py — mmdet reuses FastRCNN with mask
    heads; registered separately here for config clarity)."""

    mask_roi_extractor: Optional[nn.Module] = None
    mask_head: Optional[nn.Module] = None

    def _mask_losses(self, feats, rois, sel_boxes, sel_pos, gt_idx,
                     labels_f, gt_bboxes, gt_masks):
        if self.mask_head is None or gt_masks is None:
            return {}
        mask_feats = self.mask_roi_extractor(feats[:4], rois)
        mask_pred = self.mask_head(mask_feats, train=True)
        out = mask_pred.shape[1]
        flat = lambda x: x.reshape((-1,) + x.shape[2:])

        def per_image_targets(gm, gb, rb, gi, pm):
            return mask_target(gm, gb, rb, gi, pm, out_size=out)

        targets = jax.vmap(per_image_targets)(
            gt_masks, gt_bboxes, sel_boxes, gt_idx, sel_pos)
        return dict(loss_mask=self.mask_head.loss(
            mask_pred, flat(targets), labels_f,
            flat(sel_pos).astype(jnp.float32)))

    def simple_test(self, img, img_shapes, scale_factors, pad_shapes,
                    proposals=None, prop_valid=None, rescale: bool = True):
        dets, labels = super().simple_test(img, img_shapes, scale_factors,
                                           pad_shapes, proposals, prop_valid,
                                           rescale=rescale)
        if self.mask_head is None:
            return dets, labels
        feats = self.extract_feat(img)
        boxes = dets[..., :4]
        if rescale:
            boxes = boxes * scale_factors[:, None, None]
        rois = TwoStageDetector._to_rois(boxes)
        mask_feats = self.mask_roi_extractor(feats[:4], rois)
        mask_pred = jax.nn.sigmoid(self.mask_head(mask_feats))
        C = mask_pred.shape[-1]
        lab = jnp.clip(labels.reshape(-1), 0, C - 1)
        per_det = jnp.take_along_axis(mask_pred, lab[:, None, None, None],
                                      axis=-1)[..., 0]
        B, N = labels.shape
        masks = per_det.reshape(B, N, mask_pred.shape[1], mask_pred.shape[2])
        return dets, labels, masks
