"""Mask R-CNN (ref: mmdet/models/detectors/mask_rcnn.py + two_stage.py mask
branch).

Extends the fixed-shape two-stage pipeline with an FCN mask branch.  Ground
truth masks ride along as fixed (max_gt, S, S) box-frame crops (see
core/mask/mask_target.py); mask targets are bilinear resamples of the
matched gt crop into each positive RoI — no host round trips.
``simple_test`` returns (dets, labels, mask_probs (B, max_per_img, 28, 28)),
each mask in its detection's box frame (paste-back happens on host).
"""

from __future__ import annotations

from typing import Any, Optional

import flax.linen as nn
import jax
import jax.numpy as jnp

from ...core.bbox import MaxIoUAssigner
from ...core.mask import mask_target
from ..registry import DETECTORS
from .two_stage import TwoStageDetector, sample_rois_batch


@DETECTORS.register_module
class MaskRCNN(TwoStageDetector):
    mask_roi_extractor: Optional[nn.Module] = None
    mask_head: Optional[nn.Module] = None

    def forward_train(self, img, gt_bboxes, gt_labels, gt_valid,
                      img_shapes, pad_shapes, gt_masks=None, rng=None,
                      gt_bboxes_ignore=None, gt_ignore_valid=None):
        losses, _ = self._train_core(img, gt_bboxes, gt_labels, gt_valid,
                                     img_shapes, pad_shapes, gt_masks, rng,
                                     gt_bboxes_ignore, gt_ignore_valid)
        return losses

    def _train_core(self, img, gt_bboxes, gt_labels, gt_valid,
                    img_shapes, pad_shapes, gt_masks=None, rng=None,
                    gt_bboxes_ignore=None, gt_ignore_valid=None):
        """Shared train pipeline; returns (losses, aux) where aux carries the
        sampled-RoI intermediates (feats, rois, sel_*, mask branch tensors)
        so subclasses (MaskScoringRCNN) can extend the SAME sampling pass
        instead of re-deriving RoIs (ref: two_stage.forward_train keeps
        sampling_results in scope for the maskiou extension)."""
        tcfg = dict(self.train_cfg or {})
        rpn_cfg = dict(tcfg.get("rpn", {}))
        rcnn_cfg = dict(tcfg.get("rcnn", {}))
        feats = self.extract_feat(img, train=True)
        rpn_outs = self.rpn_head(feats, train=True)
        ig_kw = ({} if gt_bboxes_ignore is None else
                 dict(gt_bboxes_ignore=gt_bboxes_ignore,
                      gt_ignore_valid=gt_ignore_valid))
        rpn_losses = self.rpn_head.loss(
            *rpn_outs, gt_bboxes, jnp.ones_like(gt_labels), gt_valid,
            img_shapes, pad_shapes, rpn_cfg, **ig_kw)
        rpn_losses = {f"rpn_{k}": v for k, v in rpn_losses.items()}

        proposal_cfg = dict(tcfg.get("rpn_proposal",
                                     dict(nms_pre=2000, max_num=2000)))
        test_cfg2 = dict(nms_pre=proposal_cfg.get("nms_pre", 2000),
                         score_thr=0.0,
                         nms=dict(iou_thr=proposal_cfg.get("nms_thr", 0.7)),
                         max_per_img=proposal_cfg.get("max_num", 2000))
        dets = self._stop_grad_proposals(rpn_outs, img_shapes, pad_shapes,
                                         test_cfg2)

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
        sel_boxes, sel_pos, sel_valid, matched_gt, labels, gt_idx = \
            sample_rois_batch(rng, dets[..., :4], dets[..., 4] > 0,
                              gt_bboxes, gt_valid, gt_labels, assigner,
                              num_samples, pos_fraction,
                              sampler_cfg=sampler_cfg)

        rois = self._to_rois(sel_boxes)
        roi_feats = self.bbox_roi_extractor(feats[:4], rois)
        cls_score, bbox_pred = self.bbox_head(roi_feats, train=True)
        from ..bbox_heads.bbox_head import bbox_target_single
        flat = lambda x: x.reshape((-1,) + x.shape[2:])
        labels_f, bbox_t, bbox_w = bbox_target_single(
            flat(sel_boxes), flat(sel_pos), flat(matched_gt), flat(labels),
            self.bbox_head.target_means, self.bbox_head.target_stds)
        losses = self.bbox_head.loss(cls_score, bbox_pred, labels_f,
                                     flat(sel_valid).astype(jnp.float32),
                                     bbox_t, bbox_w)
        losses.update(rpn_losses)

        aux = dict(feats=feats, rois=rois, sel_boxes=sel_boxes,
                   sel_pos=sel_pos, sel_valid=sel_valid, labels_f=labels_f,
                   gt_idx=gt_idx)
        if self.mask_head is not None and gt_masks is not None:
            mask_feats = self.mask_roi_extractor(feats[:4], rois)
            mask_pred = self.mask_head(mask_feats, train=True)  # (R,28,28,C-1)
            out = mask_pred.shape[1]

            def per_image_targets(gm, gb, rb, gi, pm):
                return mask_target(gm, gb, rb, gi, pm, out_size=out)

            targets = jax.vmap(per_image_targets)(
                gt_masks, gt_bboxes, sel_boxes, gt_idx, sel_pos)
            losses["loss_mask"] = self.mask_head.loss(
                mask_pred, flat(targets), labels_f,
                flat(sel_pos).astype(jnp.float32))
            aux.update(mask_feats=mask_feats, mask_pred=mask_pred,
                       mask_targets=targets)
        return losses, aux

    def simple_test(self, img, img_shapes, scale_factors, pad_shapes,
                    rescale: bool = True):
        dets, labels = super().simple_test(img, img_shapes, scale_factors,
                                           pad_shapes, rescale=rescale)
        if self.mask_head is None:
            return dets, labels
        feats = self.extract_feat(img)
        # mask branch on the final detections (boxes are in original-image
        # space when rescale=True -> map back to feature space)
        boxes = dets[..., :4]
        if rescale:
            boxes = boxes * scale_factors[:, None, None]
        rois = self._to_rois(boxes)
        mask_feats = self.mask_roi_extractor(feats[:4], rois)
        mask_pred = jax.nn.sigmoid(self.mask_head(mask_feats))  # (R,28,28,C-1)
        C = mask_pred.shape[-1]
        lab = jnp.clip(labels.reshape(-1), 0, C - 1)
        per_det = jnp.take_along_axis(mask_pred, lab[:, None, None, None],
                                      axis=-1)[..., 0]
        B, N = labels.shape
        masks = per_det.reshape(B, N, mask_pred.shape[1], mask_pred.shape[2])
        return dets, labels, masks

    def mask_test_boxes(self, img, boxes, labels):
        """Box-frame mask probabilities for externally supplied detections
        in VIEW coordinates — the per-view primitive of mask TTA (ref:
        test_mixins.py (aug_test_mask)).  boxes (B, N, 4), labels (B, N);
        returns (B, N, S, S) sigmoid probs for each detection's label."""
        feats = self.extract_feat(img)
        rois = self._to_rois(boxes)
        mask_feats = self.mask_roi_extractor(feats[:4], rois)
        mask_pred = jax.nn.sigmoid(self.mask_head(mask_feats))
        C = mask_pred.shape[-1]
        lab = jnp.clip(labels.reshape(-1), 0, C - 1)
        per_det = jnp.take_along_axis(mask_pred, lab[:, None, None, None],
                                      axis=-1)[..., 0]
        B, N = labels.shape
        return per_det.reshape(B, N, mask_pred.shape[1], mask_pred.shape[2])
