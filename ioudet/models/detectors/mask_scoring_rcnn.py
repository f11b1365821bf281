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
        """Reference MaskIoUHead training semantics (ref:
        mmdet/models/detectors/mask_scoring_rcnn.py (forward_train) +
        mask_heads/maskiou_head.py (get_target)): the mask-IoU branch runs
        on the SAME sampled positive RoIs and the SAME mask predictions as
        the mask loss (shared via MaskRCNN._train_core), its target is the
        IoU of the binarized predicted mask against the gt mask with the
        full-gt-area correction (area-ratio rule), and only positives carry
        loss weight."""
        losses, aux = self._train_core(
            img, gt_bboxes, gt_labels, gt_valid, img_shapes, pad_shapes,
            gt_masks, rng, gt_bboxes_ignore, gt_ignore_valid)
        if self.mask_iou_head is None or gt_masks is None or \
                "mask_pred" not in aux:
            return losses
        mask_feats = aux["mask_feats"]          # (R, 14, 14, C)
        mask_pred = aux["mask_pred"]            # (R, S, S, C-1) logits
        targets = aux["mask_targets"]           # (B, n, S, S) RoI-frame gt
        labels_f = aux["labels_f"]              # (R,) 1-based
        sel_boxes = aux["sel_boxes"]            # (B, n, 4)
        sel_pos = aux["sel_pos"]                # (B, n) bool
        gt_idx = aux["gt_idx"]                  # (B, n) matched gt index

        flat = lambda x: x.reshape((-1,) + x.shape[2:])
        C = mask_pred.shape[-1]
        out = mask_pred.shape[1]
        safe = jnp.clip(labels_f - 1, 0, C - 1)
        pred_cls = jax.nn.sigmoid(jnp.take_along_axis(
            mask_pred, safe[:, None, None, None], axis=-1)[..., 0])

        # matched gt box + its crop occupancy fraction, per sampled RoI
        G = gt_bboxes.shape[1]
        gi = jnp.clip(gt_idx, 0, G - 1)
        matched_gt = jnp.take_along_axis(gt_bboxes, gi[..., None], axis=1)
        crop_fracs = jnp.mean(gt_masks.astype(jnp.float32), axis=(2, 3))
        matched_frac = jnp.take_along_axis(crop_fracs, gi, axis=1)

        thr = dict(dict(self.train_cfg or {}).get("rcnn", {})).get(
            "mask_thr_binary", 0.5)
        iou_t = self.mask_iou_head.mask_iou_target_ref(
            pred_cls, flat(targets), flat(sel_boxes), flat(matched_gt),
            matched_frac.reshape(-1), thr=thr)
        iou_pred = self.mask_iou_head(mask_feats, pred_cls, train=True)
        posf = flat(sel_pos).astype(jnp.float32)
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
