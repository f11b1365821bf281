"""Cascade R-CNN (ref: mmdet/models/detectors/cascade_rcnn.py
(CascadeRCNN)).

Multi-stage box refinement: each stage re-assigns the previous stage's
decoded boxes at a stricter IoU threshold (0.5 / 0.6 / 0.7) and regresses
with tighter target stds.  Fixed-shape redesign: every stage samples the
same static number of RoIs with the rank-based sampler; refined boxes flow
to the next stage under stop_gradient (the reference detaches likewise).
Inference refines boxes stage-by-stage and averages the per-stage class
scores (ref: ms_scores mean).
"""

from __future__ import annotations

from typing import Any, Optional, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from ...core.bbox import MaxIoUAssigner, delta2bbox
from ...core.post_processing import multiclass_nms
from ..bbox_heads.bbox_head import bbox_target_single
from ..heads.anchor_head import clip_boxes
from ..registry import DETECTORS
from .two_stage import TwoStageDetector, sample_rois_batch


@DETECTORS.register_module
class CascadeRCNN(nn.Module):
    backbone: nn.Module
    rpn_head: nn.Module
    bbox_roi_extractor: nn.Module
    bbox_head: Tuple[nn.Module, ...]  # one per stage
    neck: Optional[nn.Module] = None
    num_stages: int = 3
    stage_loss_weights: Tuple[float, ...] = (1.0, 0.5, 0.25)
    stage_pos_thrs: Tuple[float, ...] = (0.5, 0.6, 0.7)
    train_cfg: Any = None
    test_cfg: Any = None

    def extract_feat(self, img, train: bool = False):
        x = self.backbone(img, train=train)
        if self.neck is not None:
            x = self.neck(x, train=train)
        return x

    def __call__(self, img, train: bool = False):
        return self.rpn_head(self.extract_feat(img, train=train), train=train)

    def _decode_stage(self, head, rois_boxes, bbox_pred, labels=None):
        """Refine boxes with a stage's (possibly class-specific) deltas."""
        if not head.reg_class_agnostic and labels is not None:
            r = bbox_pred.reshape(bbox_pred.shape[0], head.num_classes, 4)
            safe = jnp.clip(labels, 0, head.num_classes - 1)
            bbox_pred = jnp.take_along_axis(
                r, safe[:, None, None].repeat(4, -1), axis=1)[:, 0]
        elif not head.reg_class_agnostic:
            bbox_pred = bbox_pred.reshape(
                bbox_pred.shape[0], head.num_classes, 4)[:, 1]  # fg-agnostic
        return delta2bbox(rois_boxes, bbox_pred, head.target_means,
                          head.target_stds)

    def forward_train(self, img, gt_bboxes, gt_labels, gt_valid,
                      img_shapes, pad_shapes, rng=None,
                      gt_bboxes_ignore=None, gt_ignore_valid=None):
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

        for stage in range(self.num_stages):
            head = self.bbox_head[stage]
            thr = self.stage_pos_thrs[stage]
            assigner = MaxIoUAssigner(pos_iou_thr=thr, neg_iou_thr=thr,
                                      min_pos_iou=thr)
            rng, srng = jax.random.split(rng)
            sel_boxes, sel_pos, sel_valid, matched_gt, labels, _ = \
                sample_rois_batch(srng, boxes, box_valid, gt_bboxes,
                                  gt_valid, gt_labels, assigner,
                                  num_samples, pos_fraction,
                                  sampler_cfg=sampler_cfg)
            rois = TwoStageDetector._to_rois(sel_boxes)
            roi_feats = self.bbox_roi_extractor(feats[:4], rois)
            cls_score, bbox_pred = head(roi_feats, train=True)
            flat = lambda x: x.reshape((-1,) + x.shape[2:])
            labels_f, bbox_t, bbox_w = bbox_target_single(
                flat(sel_boxes), flat(sel_pos), flat(matched_gt), flat(labels),
                head.target_means, head.target_stds)
            stage_losses = head.loss(cls_score, bbox_pred, labels_f,
                                     flat(sel_valid).astype(jnp.float32),
                                     bbox_t, bbox_w)
            w = self.stage_loss_weights[stage]
            losses.update({f"s{stage}_{k}": v * w
                           for k, v in stage_losses.items()})

            if stage < self.num_stages - 1:
                # refine: decode this stage's predictions as next proposals
                pred_labels = jnp.argmax(cls_score, axis=-1)
                refined = self._decode_stage(
                    head, rois[:, 1:], jax.lax.stop_gradient(bbox_pred),
                    pred_labels)
                boxes = refined.reshape(B, num_samples, 4)
                box_valid = sel_valid
        return losses

    def simple_test(self, img, img_shapes, scale_factors, pad_shapes,
                    rescale: bool = True):
        cfg = dict(self.test_cfg or {})
        rpn_cfg = dict(cfg.get("rpn", dict(nms_pre=1000, max_num=1000,
                                           nms_thr=0.7)))
        rcnn_cfg = dict(cfg.get("rcnn", dict(score_thr=0.05,
                                             nms=dict(iou_thr=0.5),
                                             max_per_img=100)))
        feats = self.extract_feat(img)
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
            roi_feats = self.bbox_roi_extractor(feats[:4], rois)
            cls_score, bbox_pred = head(roi_feats)
            ms_scores.append(jax.nn.softmax(cls_score, axis=-1))
            pred_labels = jnp.argmax(cls_score, axis=-1)
            refined = self._decode_stage(head, rois[:, 1:], bbox_pred,
                                         pred_labels)
            boxes = refined.reshape(B, P, 4)
        scores = sum(ms_scores) / self.num_stages  # (B*P, C)
        num_classes = self.bbox_head[-1].num_classes
        scores = scores[:, 1:].reshape(B, P, num_classes - 1)

        # exclude zero-padded proposal slots (same fix as TwoStageDetector
        # .simple_test: (0,0,0,0) RoIs must not produce detections)
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

        return jax.vmap(single)(boxes, scores, img_shapes, scale_factors,
                                prop_valid)

    # ------------------------------------------------------ TTA building blocks

    def extract_proposals(self, img, img_shapes, pad_shapes):
        """Per-view RPN proposals in VIEW coordinates (ref:
        CascadeRCNN.aug_test proposal stage)."""
        cfg = dict(self.test_cfg or {})
        rpn_cfg = dict(cfg.get("rpn", dict(nms_pre=1000, max_num=1000,
                                           nms_thr=0.7)))
        feats = self.extract_feat(img)
        outs = self.rpn_head(feats)
        test_cfg2 = dict(nms_pre=rpn_cfg.get("nms_pre", 1000), score_thr=0.0,
                         nms=dict(iou_thr=rpn_cfg.get("nms_thr", 0.7)),
                         max_per_img=rpn_cfg.get("max_num", 1000))
        props, _ = self.rpn_head.get_bboxes(
            *outs, img_shapes, jnp.ones((img.shape[0],), jnp.float32),
            pad_shapes, test_cfg2, rescale=False)
        return props

    def rcnn_test_raw(self, img, prop_boxes, img_shapes):
        """Full cascade refinement on externally supplied proposals — per
        proposal, averaged stage scores and the final refined box broadcast
        per class, in VIEW coordinates, NO NMS (ref: CascadeRCNN.aug_test:
        stage loop + ms_scores mean per view, merged afterwards).

        prop_boxes: (B, P, 4).  Returns (scores (B, P, C-1),
        boxes (B, P, C-1, 4))."""
        feats = self.extract_feat(img)
        B, P = prop_boxes.shape[:2]
        boxes = prop_boxes
        ms_scores = []
        for stage in range(self.num_stages):
            head = self.bbox_head[stage]
            rois = TwoStageDetector._to_rois(boxes)
            roi_feats = self.bbox_roi_extractor(feats[:4], rois)
            cls_score, bbox_pred = head(roi_feats)
            ms_scores.append(jax.nn.softmax(cls_score.astype(jnp.float32),
                                            axis=-1))
            pred_labels = jnp.argmax(cls_score, axis=-1)
            refined = self._decode_stage(head, rois[:, 1:], bbox_pred,
                                         pred_labels)
            boxes = refined.reshape(B, P, 4)
        num_classes = self.bbox_head[-1].num_classes
        scores = (sum(ms_scores) / self.num_stages)[:, 1:]
        scores = scores.reshape(B, P, num_classes - 1)
        bb = jnp.broadcast_to(boxes[:, :, None, :],
                              (B, P, num_classes - 1, 4))
        bb = jax.vmap(clip_boxes)(bb, img_shapes)
        return scores, bb
