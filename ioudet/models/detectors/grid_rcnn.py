"""Grid R-CNN (ref capability: mmdet/models/detectors/grid_rcnn.py
(GridRCNN)).

Two-stage detector whose localization comes from the grid head instead of
the bbox head's regression: training adds a grid branch over (jittered)
positive RoIs; inference runs the standard box path to get scored
detections, then replaces each detection's coordinates with the fused
grid-point estimates (no second NMS, as in the reference).

Fixed-shape notes: the grid branch always runs on the full (B*num_samples)
RoI set with a positive mask in the loss (positives-only compute would be a
dynamic shape); at test time it runs on the final (B*max_per_img) dets —
both dense, static, MXU-friendly batches.
"""

from __future__ import annotations

from typing import Any, Optional

import flax.linen as nn
import jax
import jax.numpy as jnp

from ...core.bbox import MaxIoUAssigner
from ..bbox_heads.bbox_head import bbox_target_single
from ..heads.anchor_head import clip_boxes
from ..mask_heads.grid_head import extend_box
from ..registry import DETECTORS
from .two_stage import TwoStageDetector, sample_rois_batch


@DETECTORS.register_module
class GridRCNN(TwoStageDetector):
    grid_roi_extractor: Optional[nn.Module] = None
    grid_head: Optional[nn.Module] = None

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
        rng, jrng = jax.random.split(rng)
        sel_boxes, sel_pos, sel_valid, matched_gt, labels, _ = \
            sample_rois_batch(rng, dets[..., :4], dets[..., 4] > 0,
                              gt_bboxes, gt_valid, gt_labels, assigner,
                              num_samples, pos_fraction,
                              sampler_cfg=sampler_cfg)

        rois = self._to_rois(sel_boxes)
        roi_feats = self.bbox_roi_extractor(feats[:4], rois)
        cls_score, bbox_pred = self.bbox_head(roi_feats, train=True)
        flat = lambda x: x.reshape((-1,) + x.shape[2:])
        labels_f, bbox_t, bbox_w = bbox_target_single(
            flat(sel_boxes), flat(sel_pos), flat(matched_gt), flat(labels),
            self.bbox_head.target_means, self.bbox_head.target_stds)
        losses.update(self.bbox_head.loss(
            cls_score, bbox_pred, labels_f,
            flat(sel_valid).astype(jnp.float32), bbox_t, bbox_w))

        # grid branch: jittered positive RoIs (ref: GridRCNN._random_jitter
        # amplitude 0.15 of box size) -> extended RoIs -> heatmaps vs
        # matched-gt grid targets
        gcfg = dict(rcnn_cfg.get("grid", {}))
        amp = gcfg.get("jitter_amplitude", 0.15)
        extend = gcfg.get("extend_factor", 2.0)
        boxes_f = flat(sel_boxes)
        wh = jnp.concatenate([boxes_f[:, 2:4] - boxes_f[:, 0:2]] * 2, -1)
        jit = (jax.random.uniform(jrng, boxes_f.shape) * 2 - 1) * amp * wh
        jittered = boxes_f + jit
        grid_rois_boxes = extend_box(jittered, extend)
        B, N = sel_boxes.shape[:2]
        bidx = jnp.repeat(jnp.arange(B, dtype=boxes_f.dtype), N)[:, None]
        grid_rois = jnp.concatenate([bidx, grid_rois_boxes], axis=-1)
        grid_feats = self.grid_roi_extractor(feats[:4], grid_rois)
        heatmaps = self.grid_head(grid_feats, train=True)
        targets, point_w = self.grid_head.get_targets(
            grid_rois_boxes, flat(matched_gt))
        losses["loss_grid"] = self.grid_head.loss(
            heatmaps, targets, point_w, flat(sel_pos).astype(jnp.float32))
        return losses

    def simple_test(self, img, img_shapes, scale_factors, pad_shapes,
                    rescale: bool = True):
        # box path WITHOUT rescale so grid refinement happens in feature
        # coords, then rescale at the end
        dets, labels = super().simple_test(img, img_shapes, scale_factors,
                                           pad_shapes, rescale=False)
        feats = self.extract_feat(img)
        gcfg = dict(dict(self.test_cfg or {}).get("rcnn", {}))
        extend = gcfg.get("grid_extend_factor", 2.0)
        boxes = dets[..., :4]
        B, N = boxes.shape[:2]
        rois = self._to_rois(
            extend_box(boxes.reshape(B * N, 4), extend).reshape(B, N, 4))
        grid_feats = self.grid_roi_extractor(feats[:4], rois)
        heatmaps = self.grid_head(grid_feats)
        refined = self.grid_head.get_bboxes(
            boxes.reshape(B * N, 4), heatmaps, extend)
        refined = refined.reshape(B, N, 4)
        refined = jax.vmap(clip_boxes)(refined, img_shapes)
        # keep score-0 padding rows degenerate
        is_valid = (dets[..., 4] > 0)[..., None]
        refined = jnp.where(is_valid, refined, boxes)
        if rescale:
            refined = refined / scale_factors[:, None, None]
        dets = jnp.concatenate([refined, dets[..., 4:]], axis=-1)
        return dets, labels
