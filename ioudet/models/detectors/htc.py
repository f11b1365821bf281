"""Hybrid Task Cascade (ref capability: mmdet/models/detectors/htc.py
(HybridTaskCascade)).

HTC = Cascade R-CNN + three couplings, all implemented here:
  1. **Semantic branch**: FusedSemanticHead over the FPN pyramid produces a
     stride-8 semantic feature map; box and mask branches RoIAlign it and
     add it to their RoI features (``semantic_fusion``).  Trained with CE
     against ``gt_semantic_seg`` when the batch provides it.
  2. **Interleaved execution**: each stage's mask branch runs on proposals
     REFINED by the same stage's box head (re-assigned and re-sampled with
     the stage's IoU threshold) instead of the pre-refinement boxes.
  3. **Mask information flow**: stage i's mask head receives stage i-1's
     pre-upsample mask feature through a 1x1 transfer conv (HTCMaskHead);
     previous heads are re-run on the current RoIs to produce it, exactly
     like the reference's feature hand-off.

Fixed-shape TPU design mirrors CascadeRCNN: every stage samples the same
static RoI count; mask compute always runs on the full RoI set with
positive masking in the loss.  At test time per-stage mask probabilities
are averaged (ref: aug mask ensemble over stages).
"""

from __future__ import annotations

from typing import Any, Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from ...core.bbox import MaxIoUAssigner
from ...core.mask import mask_target
from ...core.post_processing import multiclass_nms
from ..bbox_heads.bbox_head import bbox_target_single
from ..heads.anchor_head import clip_boxes
from ..registry import DETECTORS
from .cascade_rcnn import CascadeRCNN
from .two_stage import TwoStageDetector, sample_rois_batch


@DETECTORS.register_module
class HybridTaskCascade(CascadeRCNN):
    mask_roi_extractor: Optional[nn.Module] = None
    mask_head: Tuple[nn.Module, ...] = ()
    semantic_roi_extractor: Optional[nn.Module] = None
    semantic_head: Optional[nn.Module] = None
    interleaved: bool = True
    mask_info_flow: bool = True

    # ---------------------------------------------------------------- util

    def _bbox_feats(self, feats, rois, semantic_feat, train=False):
        roi_feats = self.bbox_roi_extractor(feats[:4], rois)
        if semantic_feat is not None and self.semantic_roi_extractor is not None:
            sem = self.semantic_roi_extractor([semantic_feat], rois)
            if sem.shape[1] != roi_feats.shape[1]:  # 14 -> 7 avg pool
                k = sem.shape[1] // roi_feats.shape[1]
                sem = nn.avg_pool(sem, (k, k), strides=(k, k))
            roi_feats = roi_feats + sem
        return roi_feats

    def _mask_feats(self, feats, rois, semantic_feat):
        mask_feats = self.mask_roi_extractor(feats[:4], rois)
        if semantic_feat is not None and self.semantic_roi_extractor is not None:
            sem = self.semantic_roi_extractor([semantic_feat], rois)
            mask_feats = mask_feats + sem
        return mask_feats

    def _run_mask_stage(self, stage, mask_feats, train=False):
        """Mask info flow: re-run heads 0..stage-1 to hand their feature
        forward, then run this stage's head."""
        last_feat = None
        if self.mask_info_flow:
            for j in range(stage):
                _, last_feat = self.mask_head[j](
                    mask_feats, last_feat, train=train, return_feat=True)
        logits, feat = self.mask_head[stage](
            mask_feats, last_feat, train=train, return_feat=True)
        return logits, feat

    # ---------------------------------------------------------------- train

    def forward_train(self, img, gt_bboxes, gt_labels, gt_valid,
                      img_shapes, pad_shapes, gt_masks=None, rng=None,
                      gt_bboxes_ignore=None, gt_ignore_valid=None,
                      gt_semantic_seg=None):
        tcfg = dict(self.train_cfg or {})
        rpn_cfg = dict(tcfg.get("rpn", {}))
        rcnn_cfg = dict(tcfg.get("rcnn", {}))
        feats = self.extract_feat(img, train=True)
        rpn_outs = self.rpn_head(feats, train=True)
        ig_kw = ({} if gt_bboxes_ignore is None else
                 dict(gt_bboxes_ignore=gt_bboxes_ignore,
                      gt_ignore_valid=gt_ignore_valid))
        losses = {f"rpn_{k}": v for k, v in self.rpn_head.loss(
            *rpn_outs, gt_bboxes, jnp.ones_like(gt_labels), gt_valid,
            img_shapes, pad_shapes, rpn_cfg, **ig_kw).items()}

        semantic_feat = None
        if self.semantic_head is not None:
            seg_pred, semantic_feat = self.semantic_head(feats, train=True)
            if gt_semantic_seg is not None:
                losses["loss_semantic_seg"] = self.semantic_head.loss(
                    seg_pred, gt_semantic_seg)

        proposal_cfg = dict(tcfg.get("rpn_proposal",
                                     dict(nms_pre=2000, max_num=2000)))
        test_cfg2 = dict(nms_pre=proposal_cfg.get("nms_pre", 2000),
                         score_thr=0.0,
                         nms=dict(iou_thr=proposal_cfg.get("nms_thr", 0.7)),
                         max_per_img=proposal_cfg.get("max_num", 2000))
        outs_sg = jax.tree.map(jax.lax.stop_gradient, rpn_outs)
        props, _ = self.rpn_head.get_bboxes(
            *outs_sg, img_shapes, jnp.ones((img.shape[0],), jnp.float32),
            pad_shapes, test_cfg2, rescale=False)

        sampler_cfg = dict(rcnn_cfg.get("sampler", {}))
        num_samples = sampler_cfg.get("num", 512)
        pos_fraction = sampler_cfg.get("pos_fraction", 0.25)
        if rng is None:
            rng = self.make_rng("sampler") if self.has_rng("sampler") else \
                jax.random.PRNGKey(0)
        B = img.shape[0]
        boxes = props[..., :4]
        box_valid = props[..., 4] > 0
        flat = lambda x: x.reshape((-1,) + x.shape[2:])

        for stage in range(self.num_stages):
            head = self.bbox_head[stage]
            thr = self.stage_pos_thrs[stage]
            assigner = MaxIoUAssigner(pos_iou_thr=thr, neg_iou_thr=thr,
                                      min_pos_iou=thr)
            rng, srng = jax.random.split(rng)
            sel_boxes, sel_pos, sel_valid, matched_gt, labels, gt_idx = \
                sample_rois_batch(srng, boxes, box_valid, gt_bboxes,
                                  gt_valid, gt_labels, assigner,
                                  num_samples, pos_fraction,
                                  sampler_cfg=sampler_cfg)
            rois = TwoStageDetector._to_rois(sel_boxes)
            roi_feats = self._bbox_feats(feats, rois, semantic_feat,
                                         train=True)
            cls_score, bbox_pred = head(roi_feats, train=True)
            labels_f, bbox_t, bbox_w = bbox_target_single(
                flat(sel_boxes), flat(sel_pos), flat(matched_gt),
                flat(labels), head.target_means, head.target_stds)
            w = self.stage_loss_weights[stage]
            for k, v in head.loss(cls_score, bbox_pred, labels_f,
                                  flat(sel_valid).astype(jnp.float32),
                                  bbox_t, bbox_w).items():
                losses[f"s{stage}_{k}"] = v * w

            # refined boxes (used by interleaved mask branch AND next stage)
            pred_labels = jnp.argmax(cls_score, axis=-1)
            refined = self._decode_stage(
                head, rois[:, 1:], jax.lax.stop_gradient(bbox_pred),
                pred_labels).reshape(B, num_samples, 4)

            if self.mask_head and gt_masks is not None:
                if self.interleaved:
                    # re-assign + re-sample the REFINED boxes at this
                    # stage's threshold for the mask branch (ref: htc.py
                    # interleaved execution)
                    rng, mrng = jax.random.split(rng)
                    m_boxes, m_pos, m_valid, m_gt, m_labels, m_gtidx = \
                        sample_rois_batch(mrng, refined, sel_valid,
                                          gt_bboxes, gt_valid, gt_labels,
                                          assigner, num_samples,
                                          pos_fraction,
                                          sampler_cfg=sampler_cfg)
                else:
                    m_boxes, m_pos, m_labels, m_gtidx = (
                        sel_boxes, sel_pos, labels, gt_idx)
                m_rois = TwoStageDetector._to_rois(m_boxes)
                mask_feats = self._mask_feats(feats, m_rois, semantic_feat)
                mask_pred, _ = self._run_mask_stage(stage, mask_feats,
                                                    train=True)
                out = mask_pred.shape[1]
                targets = jax.vmap(
                    lambda gm, gb, rb, gi, pm: mask_target(
                        gm, gb, rb, gi, pm, out_size=out))(
                    gt_masks, gt_bboxes, m_boxes, m_gtidx, m_pos)
                losses[f"s{stage}_loss_mask"] = w * self.mask_head[stage].loss(
                    mask_pred, flat(targets),
                    jnp.where(flat(m_pos), flat(m_labels), 0),
                    flat(m_pos).astype(jnp.float32))

            if stage < self.num_stages - 1:
                boxes = refined
                box_valid = sel_valid
        return losses

    # ---------------------------------------------------------------- test

    def simple_test(self, img, img_shapes, scale_factors, pad_shapes,
                    rescale: bool = True):
        cfg = dict(self.test_cfg or {})
        rpn_cfg = dict(cfg.get("rpn", dict(nms_pre=1000, max_num=1000,
                                           nms_thr=0.7)))
        rcnn_cfg = dict(cfg.get("rcnn", dict(score_thr=0.05,
                                             nms=dict(iou_thr=0.5),
                                             max_per_img=100)))
        feats = self.extract_feat(img)
        semantic_feat = None
        if self.semantic_head is not None:
            _, semantic_feat = self.semantic_head(feats)
        outs = self.rpn_head(feats)
        test_cfg2 = dict(nms_pre=rpn_cfg.get("nms_pre", 1000), score_thr=0.0,
                         nms=dict(iou_thr=rpn_cfg.get("nms_thr", 0.7)),
                         max_per_img=rpn_cfg.get("max_num", 1000))
        props, _ = self.rpn_head.get_bboxes(
            *outs, img_shapes, jnp.ones((img.shape[0],), jnp.float32),
            pad_shapes, test_cfg2, rescale=False)
        B, P = props.shape[:2]
        boxes = props[..., :4]
        ms_scores = []
        for stage in range(self.num_stages):
            head = self.bbox_head[stage]
            rois = TwoStageDetector._to_rois(boxes)
            roi_feats = self._bbox_feats(feats, rois, semantic_feat)
            cls_score, bbox_pred = head(roi_feats)
            ms_scores.append(jax.nn.softmax(cls_score, axis=-1))
            pred_labels = jnp.argmax(cls_score, axis=-1)
            boxes = self._decode_stage(head, rois[:, 1:], bbox_pred,
                                       pred_labels).reshape(B, P, 4)
        scores = sum(ms_scores) / self.num_stages
        num_classes = self.bbox_head[-1].num_classes
        scores = scores[:, 1:].reshape(B, P, num_classes - 1)
        prop_valid = props[..., 4] > 0

        def single(b, s, img_shape, sf, pv):
            b = clip_boxes(b, img_shape)
            if rescale:
                b = b / sf
            bb = jnp.broadcast_to(b[:, None, :], (P, num_classes - 1, 4))
            return multiclass_nms(
                bb.reshape(P, (num_classes - 1) * 4), s,
                score_thr=rcnn_cfg.get("score_thr", 0.05),
                iou_thr=rcnn_cfg.get("nms", {}).get("iou_thr", 0.5),
                max_per_img=rcnn_cfg.get("max_per_img", 100),
                valid=pv)

        dets, labels = jax.vmap(single)(boxes, scores, img_shapes,
                                        scale_factors, prop_valid)
        if not self.mask_head:
            return dets, labels

        det_boxes = dets[..., :4]
        if rescale:
            det_boxes = det_boxes * scale_factors[:, None, None]
        m_rois = TwoStageDetector._to_rois(det_boxes)
        mask_feats = self._mask_feats(feats, m_rois, semantic_feat)
        probs = None
        for stage in range(self.num_stages):
            logits, _ = self._run_mask_stage(stage, mask_feats)
            p = jax.nn.sigmoid(logits)
            probs = p if probs is None else probs + p
        probs = probs / self.num_stages          # (R, 28, 28, C-1)
        C = probs.shape[-1]
        lab = jnp.clip(labels.reshape(-1), 0, C - 1)
        per_det = jnp.take_along_axis(probs, lab[:, None, None, None],
                                      axis=-1)[..., 0]
        N = labels.shape[1]
        masks = per_det.reshape(B, N, probs.shape[1], probs.shape[2])
        return dets, labels, masks
