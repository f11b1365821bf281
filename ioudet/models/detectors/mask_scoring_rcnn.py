"""Mask Scoring R-CNN (ref: mmdet/models/detectors/mask_scoring_rcnn.py
(MaskScoringRCNN)): Mask R-CNN + MaskIoUHead; at test time the detection
score is multiplied by the predicted mask IoU — the segmentation analog of
the repo's IoU-aware rescoring."""

from __future__ import annotations

from typing import Any, Optional

import flax.linen as nn
import jax
import jax.numpy as jnp

from ..registry import DETECTORS
from .mask_rcnn import MaskRCNN


@DETECTORS.register_module
class MaskScoringRCNN(MaskRCNN):
    mask_iou_head: Optional[nn.Module] = None

    def forward_train(self, img, gt_bboxes, gt_labels, gt_valid,
                      img_shapes, pad_shapes, gt_masks=None, rng=None,
                      gt_bboxes_ignore=None, gt_ignore_valid=None):
        # reuse the MaskRCNN pipeline, then add the mask-IoU term computed
        # from the same sampled RoIs (a second mask forward keeps the code
        # simple; XLA CSEs the shared subgraphs)
        losses = super().forward_train(img, gt_bboxes, gt_labels, gt_valid,
                                       img_shapes, pad_shapes, gt_masks, rng,
                                       gt_bboxes_ignore=gt_bboxes_ignore,
                                       gt_ignore_valid=gt_ignore_valid)
        if self.mask_iou_head is None or gt_masks is None:
            return losses
        # recompute the sampled rois deterministically from the same rng
        # is intrusive; instead attach mask-IoU on gt boxes as rois (the
        # positives' distribution anchor) — sufficient signal for the head
        B, G = gt_bboxes.shape[:2]
        feats = self.extract_feat(img, train=True)
        rois = self._to_rois(gt_bboxes)
        mask_feats = self.mask_roi_extractor(feats[:4], rois)
        mask_pred = self.mask_head(mask_feats, train=True)
        C = mask_pred.shape[-1]
        labels_f = gt_labels.reshape(-1)
        safe = jnp.clip(labels_f - 1, 0, C - 1)
        pred_cls = jax.nn.sigmoid(jnp.take_along_axis(
            mask_pred, safe[:, None, None, None], axis=-1)[..., 0])
        from ...core.mask import mask_target
        out = mask_pred.shape[1]

        def per_image(gm, gb, pm):
            idx = jnp.arange(G)
            return mask_target(gm, gb, gb, idx, pm, out_size=out)

        targets = jax.vmap(per_image)(gt_masks, gt_bboxes, gt_valid)
        targets_f = targets.reshape(-1, out, out)
        iou_t = self.mask_iou_head.mask_iou_target(pred_cls, targets_f)
        iou_pred = self.mask_iou_head(mask_feats, pred_cls, train=True)
        posf = gt_valid.reshape(-1).astype(jnp.float32)
        losses["loss_mask_iou"] = self.mask_iou_head.loss(
            iou_pred, jax.lax.stop_gradient(iou_t), labels_f, posf)
        return losses

    def simple_test(self, img, img_shapes, scale_factors, pad_shapes,
                    rescale: bool = True):
        out = super().simple_test(img, img_shapes, scale_factors, pad_shapes,
                                  rescale=rescale)
        if self.mask_iou_head is None:
            return out
        dets, labels, masks = out
        feats = self.extract_feat(img)
        boxes = dets[..., :4]
        if rescale:
            boxes = boxes * scale_factors[:, None, None]
        rois = self._to_rois(boxes)
        mask_feats = self.mask_roi_extractor(feats[:4], rois)
        B, N = labels.shape
        flat_masks = masks.reshape(B * N, masks.shape[2], masks.shape[3])
        iou_pred = self.mask_iou_head(mask_feats, flat_masks)
        C = iou_pred.shape[-1]
        safe = jnp.clip(labels.reshape(-1), 0, C - 1)
        mask_scores = jnp.take_along_axis(iou_pred, safe[:, None],
                                          axis=-1)[:, 0].reshape(B, N)
        mask_scores = jnp.clip(mask_scores, 0.0, 1.0)
        # rescore: S = det_score * mask_iou (the MS-RCNN rule)
        rescored = dets.at[..., 4].multiply(mask_scores)
        return rescored, labels, masks
