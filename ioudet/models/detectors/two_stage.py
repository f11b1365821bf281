"""Two-stage detector (ref: mmdet/models/detectors/two_stage.py
(TwoStageDetector) + faster_rcnn.py, rpn.py).

Fixed-shape redesign of the R-CNN pipeline:
  * RPN proposals come from the shared fixed-shape decode+NMS machinery
    ((B, P, 5), score-padded) — no dynamic proposal lists;
  * train-time proposal sampling (RandomSampler 512 @ 25% pos,
    add_gt_as_proposals) is a rank-based fixed-k selection: per-proposal
    random priorities, positives capped by rank, negatives fill the
    remainder, one top-k gather — identical distribution to the reference's
    randperm sampling, no nonzero;
  * RoI features come from SingleRoIExtractor (dense over levels).

Mask heads (Mask R-CNN family) remain roadmap; the box pipeline (Faster
R-CNN) is complete.
"""

from __future__ import annotations

from typing import Any, Optional

import flax.linen as nn
import jax
import jax.numpy as jnp

from ...core.bbox import MaxIoUAssigner, delta2bbox
from ...core.post_processing import multiclass_nms
from ..bbox_heads.bbox_head import bbox_target_single
from ..registry import DETECTORS
from ..heads.anchor_head import clip_boxes


def sample_rois_batch(rng, proposals, prop_valid, gt_bboxes, gt_valid,
                      gt_labels, assigner, num_samples, pos_fraction,
                      add_gt: bool = True, sampler_cfg=None,
                      hardness_fn=None):
    """Fixed-shape R-CNN proposal sampling, vmapped over the batch (ref:
    mmdet/core/bbox/assign_sampling.py (assign_and_sample)).

    The reference's randperm sampling becomes rank-based fixed-k selection
    through the registered sampler family (core/bbox/samplers.py):
    per-proposal priorities (uniform noise for RandomSampler, within-IoU-bin
    round-robin for Libra's IoUBalancedNegSampler, per-instance round-robin
    for InstanceBalancedPosSampler), positives capped by rank at
    num*pos_fraction, negatives fill the remainder, one top-k gather — the
    same sampling distribution with static shapes (no nonzero).

    OHEM (ref: ohem_sampler.py hard_mining): the caller supplies
    ``hardness_fn(boxes (B,N,4), labels (B,N)) -> (B,N)`` per-candidate loss
    (a stop-gradient head forward over ALL candidates, like the reference's
    no-grad pass); selection then ranks by loss instead of noise.  Without
    a hardness_fn an OHEM config falls back to random.

    Returns per-image (num_samples,)-shaped arrays:
      sel_boxes (B,N,4), sel_pos (B,N) bool, sel_valid (B,N) bool,
      matched_gt (B,N,4), labels (B,N) int (0 for negatives), gt_idx (B,N).
    """
    from ...core.bbox.samplers import OHEMSampler, build_sampler

    B = proposals.shape[0]
    G = gt_bboxes.shape[1]
    scfg = {k: v for k, v in dict(sampler_cfg or {}).items()
            if k not in ("type", "num", "pos_fraction",
                         "add_gt_as_proposals")}
    styp = dict(sampler_cfg or {}).get("type", "RandomSampler")
    use_ohem = styp == "OHEMSampler" and hardness_fn is not None
    if styp in ("OHEMSampler", "PseudoSampler") and not use_ohem:
        styp, scfg = "RandomSampler", {}
    sampler = build_sampler(dict(scfg, type=styp, num=num_samples,
                                 pos_fraction=pos_fraction))

    # phase 1: assign every candidate (vmapped)
    def assign_one(props, pv, gb, gv, gl):
        if add_gt:
            boxes = jnp.concatenate([props, gb], axis=0)
            valid = jnp.concatenate([pv, gv], axis=0)
        else:
            boxes, valid = props, pv
        res = assigner.assign(boxes, gb, gv, valid, gl)
        return boxes, res.gt_inds, res.max_overlaps, res.labels

    boxes_all, gt_inds_all, max_ov_all, lab_all = jax.vmap(assign_one)(
        proposals, prop_valid, gt_bboxes, gt_valid, gt_labels)

    # phase 2: optional loss-aware hardness over ALL candidates
    hardness = (hardness_fn(boxes_all, lab_all) if use_ohem else None)

    # phase 3: per-image selection
    def select_one(key, boxes, gt_inds, max_ov, lab, gb, gv, gl, hard):
        from ...core.bbox.assigners import AssignResult
        res = AssignResult(gt_inds, max_ov, lab)
        k1, k2 = jax.random.split(key)
        if use_ohem:
            sampled_pos, sampled_neg = sampler.sample_with_losses(
                res, hard, k1)
        else:
            sampled_pos, sampled_neg = sampler.sample(res, k1)
        sel = sampled_pos | sampled_neg
        noise = jax.random.uniform(k2, sel.shape)
        prio = sel.astype(jnp.float32) * 10.0 + noise
        _, idx = jax.lax.top_k(prio, num_samples)
        safe_gt = jnp.clip(gt_inds[idx] - 1, 0, G - 1)
        return (boxes[idx], sampled_pos[idx], sel[idx], gb[safe_gt],
                jnp.where(sampled_pos[idx], gl[safe_gt], 0), safe_gt)

    keys = jax.random.split(rng, B)
    dummy = hardness if hardness is not None else \
        jnp.zeros(boxes_all.shape[:2], jnp.float32)
    return jax.vmap(select_one)(keys, boxes_all, gt_inds_all, max_ov_all,
                                lab_all, gt_bboxes, gt_valid, gt_labels,
                                dummy)


@DETECTORS.register_module
class TwoStageDetector(nn.Module):
    backbone: nn.Module
    rpn_head: nn.Module
    bbox_roi_extractor: nn.Module
    bbox_head: nn.Module
    neck: Optional[nn.Module] = None
    # shared RoI trunk (ref: mmdet/models/shared_heads/res_layer.py used by
    # the C4 configs, e.g. configs/faster_rcnn_r50_caffe_c4_1x.py): applied
    # to pooled RoI features before the box head
    shared_head: Optional[nn.Module] = None
    train_cfg: Any = None
    test_cfg: Any = None

    def _roi_forward(self, feats, rois, train: bool = False):
        rf = self.bbox_roi_extractor(feats[:4], rois)
        if self.shared_head is not None:
            rf = self.shared_head(rf, train=train)
        return rf

    def extract_feat(self, img, train: bool = False):
        x = self.backbone(img, train=train)
        if self.neck is not None:
            x = self.neck(x, train=train)
        return x

    def __call__(self, img, train: bool = False):
        feats = self.extract_feat(img, train=train)
        return self.rpn_head(feats, train=train)

    # ------------------------------------------------------------------ train

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
        # RPN is class-agnostic: binary labels
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
        assigner_cfg = {k: v for k, v in dict(
            rcnn_cfg.get("assigner", dict(pos_iou_thr=0.5, neg_iou_thr=0.5,
                                          min_pos_iou=0.5))).items()
            if k != "type"}
        assigner = MaxIoUAssigner(**assigner_cfg)
        if rng is None:
            rng = self.make_rng("sampler") if self.has_rng("sampler") else \
                jax.random.PRNGKey(0)

        hardness_fn = None
        if sampler_cfg.get("type") == "OHEMSampler":
            # OHEM (ref: ohem_sampler.py): rank candidates by their current
            # classification loss from a no-grad head forward over ALL
            # proposals (pos target = assigned label, neg target = bg)
            def hardness_fn(boxes_all, labels_all):
                B_, N_ = labels_all.shape
                rois_all = self._to_rois(jax.lax.stop_gradient(boxes_all))
                feats_sg = jax.tree.map(jax.lax.stop_gradient, feats)
                rf = self._roi_forward(feats_sg, rois_all, train=True)
                cls, _ = self.bbox_head(rf, train=True)
                tgt = jnp.clip(labels_all.reshape(-1), 0, None)
                logp = jax.nn.log_softmax(cls.astype(jnp.float32), axis=-1)
                nll = -jnp.take_along_axis(logp, tgt[:, None], axis=1)[:, 0]
                return jax.lax.stop_gradient(nll.reshape(B_, N_))

        sel_boxes, sel_pos, sel_valid, matched_gt, labels, _ = \
            sample_rois_batch(rng, dets[..., :4], dets[..., 4] > 0,
                              gt_bboxes, gt_valid, gt_labels, assigner,
                              num_samples, pos_fraction,
                              sampler_cfg=sampler_cfg,
                              hardness_fn=hardness_fn)

        rois = self._to_rois(sel_boxes)  # (B*N, 5)
        roi_feats = self._roi_forward(feats, rois, train=True)
        cls_score, bbox_pred = self.bbox_head(roi_feats, train=True)

        flat = lambda x: x.reshape((-1,) + x.shape[2:])
        labels_f, bbox_t, bbox_w = bbox_target_single(
            flat(sel_boxes), flat(sel_pos), flat(matched_gt), flat(labels),
            self.bbox_head.target_means, self.bbox_head.target_stds)
        label_w = flat(sel_valid).astype(jnp.float32)
        losses = self.bbox_head.loss(cls_score, bbox_pred, labels_f, label_w,
                                     bbox_t, bbox_w)
        losses.update(rpn_losses)
        return losses

    def _stop_grad_proposals(self, rpn_outs, img_shapes, pad_shapes, cfg):
        outs = jax.tree.map(jax.lax.stop_gradient, rpn_outs)
        dets, _ = self.rpn_head.get_bboxes(
            *outs, img_shapes, jnp.ones((img_shapes.shape[0],), jnp.float32),
            pad_shapes, cfg, rescale=False)
        return dets

    @staticmethod
    def _to_rois(boxes: jnp.ndarray) -> jnp.ndarray:
        """(B, N, 4) -> (B*N, 5) with batch index column."""
        B, N = boxes.shape[:2]
        bidx = jnp.repeat(jnp.arange(B, dtype=boxes.dtype), N)[:, None]
        return jnp.concatenate([bidx, boxes.reshape(B * N, 4)], axis=-1)

    # ------------------------------------------------------------------ test

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
        rois = self._to_rois(props[..., :4])
        roi_feats = self._roi_forward(feats, rois)
        cls_score, bbox_pred = self.bbox_head(roi_feats)
        num_classes = self.bbox_head.num_classes
        scores = jax.nn.softmax(cls_score, axis=-1)[:, 1:]  # drop bg column
        # class-specific decode: (B*P, 4C) deltas around each proposal
        boxes = self._decode_rcnn(rois, bbox_pred, num_classes)
        boxes = boxes.reshape(B, P, num_classes, 4)[:, :, 1:, :]  # drop bg
        scores = scores.reshape(B, P, num_classes - 1)

        # zero-padded proposal slots must not reach NMS: padding rows are
        # (0,0,0,0) RoIs at the origin whose pooled features could otherwise
        # score above score_thr
        prop_valid = props[..., 4] > 0

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

    def _decode_rcnn(self, rois, bbox_pred, num_classes):
        """Class-specific decode: (R, 4C) deltas on proposal boxes."""
        return delta2bbox(rois[:, 1:], bbox_pred,
                          self.bbox_head.target_means,
                          self.bbox_head.target_stds)

    # ------------------------------------------------------ TTA building blocks
    # (ref: mmdet/models/detectors/test_mixins.py (aug_test_bboxes) — per-view
    # primitives; the host-side orchestration lives in apis/test.py
    # aug_test_two_stage.)

    def extract_proposals(self, img, img_shapes, pad_shapes):
        """Per-view RPN proposals in VIEW coordinates, (B, max_num, 5)."""
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
        """R-CNN head on externally supplied proposals — per-proposal
        softmax scores and class-specific decoded boxes in VIEW
        coordinates, clipped, NO NMS (the reference's get_det_bboxes with
        cfg=None used by aug_test_bboxes).

        prop_boxes: (B, P, 4).  Returns (scores (B, P, C-1),
        boxes (B, P, C-1, 4))."""
        feats = self.extract_feat(img)
        B, P = prop_boxes.shape[:2]
        rois = self._to_rois(prop_boxes)
        roi_feats = self._roi_forward(feats, rois)
        cls_score, bbox_pred = self.bbox_head(roi_feats)
        num_classes = self.bbox_head.num_classes
        scores = jax.nn.softmax(cls_score.astype(jnp.float32), axis=-1)[:, 1:]
        boxes = self._decode_rcnn(rois, bbox_pred, num_classes)
        boxes = boxes.reshape(B, P, num_classes, 4)[:, :, 1:, :]
        boxes = jax.vmap(clip_boxes)(boxes, img_shapes)
        return scores.reshape(B, P, num_classes - 1), boxes


@DETECTORS.register_module
class FasterRCNN(TwoStageDetector):
    """ref: mmdet/models/detectors/faster_rcnn.py — registration shim."""


@DETECTORS.register_module
class DoubleHeadRCNN(TwoStageDetector):
    """Double-Head R-CNN (ref: mmdet/models/detectors/double_head_rcnn.py).
    The conv-reg/fc-cls split lives entirely inside DoubleConvFCBBoxHead
    (same (cls, reg) contract), so the two-stage pipeline is unchanged."""


@DETECTORS.register_module
class RPN(nn.Module):
    """Proposal-only detector (ref: mmdet/models/detectors/rpn.py)."""

    backbone: nn.Module
    rpn_head: nn.Module
    neck: Optional[nn.Module] = None
    train_cfg: Any = None
    test_cfg: Any = None

    def extract_feat(self, img, train: bool = False):
        x = self.backbone(img, train=train)
        if self.neck is not None:
            x = self.neck(x, train=train)
        return x

    def __call__(self, img, train: bool = False):
        return self.rpn_head(self.extract_feat(img, train=train), train=train)

    def forward_train(self, img, gt_bboxes, gt_labels, gt_valid, img_shapes,
                      pad_shapes, gt_bboxes_ignore=None,
                      gt_ignore_valid=None):
        outs = self(img, train=True)
        ig_kw = ({} if gt_bboxes_ignore is None else
                 dict(gt_bboxes_ignore=gt_bboxes_ignore,
                      gt_ignore_valid=gt_ignore_valid))
        return self.rpn_head.loss(*outs, gt_bboxes,
                                  jnp.ones_like(gt_labels), gt_valid,
                                  img_shapes, pad_shapes,
                                  dict(self.train_cfg or {}), **ig_kw)

    def simple_test(self, img, img_shapes, scale_factors, pad_shapes,
                    rescale: bool = True):
        outs = self(img)
        cfg = dict(self.test_cfg or {})
        test_cfg = dict(nms_pre=cfg.get("nms_pre", 1000), score_thr=0.0,
                        nms=dict(iou_thr=cfg.get("nms_thr", 0.7)),
                        max_per_img=cfg.get("max_num", 1000))
        return self.rpn_head.get_bboxes(
            *outs, img_shapes, scale_factors, pad_shapes, test_cfg,
            rescale=rescale)
