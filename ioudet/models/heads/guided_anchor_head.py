"""Guided Anchoring heads (ref: mmdet/models/anchor_heads/
guided_anchor_head.py (GuidedAnchorHead, FeatureAdaption), ga_retina_head.py
(GARetinaHead), ga_rpn_head.py (GARPNHead); targets ref:
mmdet/core/anchor/guided_anchor_target.py (ga_loc_target, ga_shape_target);
assigner ref: mmdet/core/bbox/assigners/approx_max_iou_assigner.py).

Guided anchoring predicts anchors instead of enumerating them:
  * a LOC branch scores each cell for being a gt center (focal loss on
    center/ignore region targets);
  * a SHAPE branch predicts (dw, dh) of the anchor at each cell (bounded-IoU
    loss against the best-matching gt, assigned by the max IoU over each
    cell's 9 "approx" anchors — the ApproxMaxIoUAssigner);
  * features are adapted by a 3x3 deformable conv whose offsets are derived
    from the shape prediction (FeatureAdaption), then standard cls/reg run
    on ONE predicted anchor per cell.

Fixed-shape redesign: loc/shape targets are computed with vectorized
per-level masks; inference keeps every cell (masking by loc score) instead
of the reference's sparse masked conv — dense compute is the TPU-efficient
equivalent (see ops/masked_conv.py).
"""

from __future__ import annotations

from typing import Any, Dict, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from ...core.anchor import AnchorGenerator
from ...core.bbox import bbox_overlaps, delta2bbox
from ...ops.deform_conv import deform_conv2d
from ..registry import HEADS
from ..utils.layers import bias_init_with_prob
from .anchor_head import AnchorHead, _CONV_INIT, _batched_nms, clip_boxes


class FeatureAdaption(nn.Module):
    """3x3 deformable conv with offsets predicted from the shape branch
    (ref: FeatureAdaption)."""

    out_channels: int = 256
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, shape_pred):
        offsets = nn.Conv(18, (1, 1), use_bias=False,
                          kernel_init=nn.initializers.normal(0.1),
                          dtype=self.dtype, name="conv_offset")(
                              jax.lax.stop_gradient(shape_pred))
        kernel = self.param("adaption_kernel", _CONV_INIT,
                            (3, 3, x.shape[-1], self.out_channels))
        return nn.relu(deform_conv2d(x, offsets, kernel.astype(self.dtype)))


@HEADS.register_module
class GuidedAnchorHead(AnchorHead):
    octave_base_scale: int = 8
    scales_per_octave: int = 3
    anchoring_means: Tuple[float, ...] = (0.0, 0.0, 0.0, 0.0)
    anchoring_stds: Tuple[float, ...] = (1.0, 1.0, 1.0, 1.0)
    loc_filter_thr: float = 0.01
    center_ratio: float = 0.2
    ignore_ratio: float = 0.5

    # squares: one base anchor per cell, size octave_base_scale * stride,
    # CENTERED on the cell like every other anchor (ref: GuidedAnchorHead
    # __init__ builds AnchorGenerator(anchor_base, [octave_base_scale],
    # [1.0]) — base_size=stride keeps the (stride-1)/2 center; passing the
    # product as base_size shifted every square by (scale-1)*stride/2,
    # caught by tests/test_guided_anchor_golden.py)
    def square_generators(self):
        return [AnchorGenerator(s, [float(self.octave_base_scale)], [1.0])
                for s in self.anchor_strides]

    def approx_generators(self):
        scales = [self.octave_base_scale * 2 ** (i / self.scales_per_octave)
                  for i in range(self.scales_per_octave)]
        return [AnchorGenerator(s, scales, list(self.anchor_ratios))
                for s in self.anchor_strides]

    @property
    def num_approx(self) -> int:
        return self.scales_per_octave * len(self.anchor_ratios)

    def branches(self):
        conv_loc = nn.Conv(1, (1, 1), kernel_init=_CONV_INIT,
                           bias_init=nn.initializers.constant(
                               bias_init_with_prob(0.01)),
                           dtype=self.dtype, name="conv_loc")
        conv_shape = nn.Conv(2, (1, 1), kernel_init=_CONV_INIT,
                             dtype=self.dtype, name="conv_shape")
        adaption = FeatureAdaption(self.feat_channels, dtype=self.dtype,
                                   name="feature_adaption")
        conv_cls = nn.Conv(self.cls_out_channels, (1, 1),
                           kernel_init=_CONV_INIT,
                           bias_init=nn.initializers.constant(
                               bias_init_with_prob(0.01)),
                           dtype=self.dtype, name="conv_cls")
        conv_reg = nn.Conv(4, (1, 1), kernel_init=_CONV_INIT,
                           dtype=self.dtype, name="conv_reg")
        return conv_loc, conv_shape, adaption, conv_cls, conv_reg

    def forward_single(self, x, branches):
        conv_loc, conv_shape, adaption, conv_cls, conv_reg = branches
        loc_pred = conv_loc(x)
        shape_pred = conv_shape(x)
        adapted = adaption(x, shape_pred)
        return (conv_cls(adapted), conv_reg(adapted), shape_pred, loc_pred)

    @nn.compact
    def __call__(self, feats, train: bool = False):
        branches = self.branches()
        outs = [self.forward_single(x, branches) for x in feats]
        return tuple(map(list, zip(*outs)))  # cls, reg, shape, loc per level

    # ------------------------------------------------------------------ anchors

    def predicted_anchors(self, shape_preds, featmap_sizes):
        """Decode per-cell predicted anchors from shape predictions:
        w = sigma * stride * exp(dw) around each square center
        (ref: GuidedAnchorHead.get_anchors anchor decoding)."""
        gens = self.square_generators()
        out = []
        for lvl, (sp, fs) in enumerate(zip(shape_preds, featmap_sizes)):
            squares = gens[lvl].grid_anchors(fs, self.anchor_strides[lvl])
            b = sp.shape[0]
            sp2 = sp.reshape(b, -1, 2)
            deltas = jnp.concatenate(
                [jnp.zeros_like(sp2), sp2], axis=-1)  # (dx,dy)=0
            anchors = jax.vmap(
                lambda d: delta2bbox(squares, d, self.anchoring_means,
                                     self.anchoring_stds,
                                     wh_ratio_clip=1e-6))(deltas)
            out.append(anchors)  # (B, HW, 4)
        return out

    # ------------------------------------------------------------------ targets

    def _loc_targets(self, gt_bboxes, gt_valid, featmap_sizes):
        """Center-region loc targets (ref: ga_loc_target): each gt maps to
        the level whose scale covers it; the center_ratio region is positive,
        the ignore_ratio region has weight 0 on that level and its
        neighbors."""
        strides = self.anchor_strides
        scale = jnp.sqrt((gt_bboxes[..., 2] - gt_bboxes[..., 0] + 1) *
                         (gt_bboxes[..., 3] - gt_bboxes[..., 1] + 1))
        # level index per gt: round(log2(scale / base)) clamped
        base = self.octave_base_scale * strides[0]
        lvl_of_gt = jnp.clip(
            jnp.round(jnp.log2(jnp.maximum(scale / base, 1e-6))),
            0, len(strides) - 1).astype(jnp.int32)

        targets, weights = [], []
        for lvl, (fs, s) in enumerate(zip(featmap_sizes, strides)):
            h, w = fs
            ys = (jnp.arange(h) + 0.5) * s
            xs = (jnp.arange(w) + 0.5) * s
            cx = (gt_bboxes[..., 0] + gt_bboxes[..., 2]) * 0.5  # (B, G)
            cy = (gt_bboxes[..., 1] + gt_bboxes[..., 3]) * 0.5
            gw = gt_bboxes[..., 2] - gt_bboxes[..., 0] + 1
            gh = gt_bboxes[..., 3] - gt_bboxes[..., 1] + 1

            def region(ratio):
                half_w = gw * ratio * 0.5
                half_h = gh * ratio * 0.5
                in_x = (jnp.abs(xs[None, :, None] - cx[:, None, :])
                        <= half_w[:, None, :])          # (B, W, G)
                in_y = (jnp.abs(ys[None, :, None] - cy[:, None, :])
                        <= half_h[:, None, :])          # (B, H, G)
                return in_y[:, :, None, :] & in_x[:, None, :, :]  # (B,H,W,G)

            on_lvl = (lvl_of_gt == lvl) & gt_valid                # (B, G)
            near_lvl = (jnp.abs(lvl_of_gt - lvl) <= 1) & gt_valid
            center = region(self.center_ratio) & on_lvl[:, None, None, :]
            ignore = region(self.ignore_ratio) & near_lvl[:, None, None, :]
            pos = jnp.any(center, axis=-1)
            ign = jnp.any(ignore, axis=-1) & ~pos
            targets.append(pos.astype(jnp.float32).reshape(pos.shape[0], -1))
            weights.append(jnp.where(ign, 0.0, 1.0).reshape(pos.shape[0], -1))
        return targets, weights

    # ------------------------------------------------------------------ loss

    def loss(self, cls_scores, bbox_preds, shape_preds, loc_preds, gt_bboxes,
             gt_labels, gt_valid, img_shapes, pad_shapes,
             train_cfg) -> Dict[str, jnp.ndarray]:
        from ...core.anchor import anchor_target
        from ...core.bbox.assigners import MaxIoUAssigner
        from ..losses.focal_loss import sigmoid_focal_loss_with_logits
        from ..losses.iou_loss import bounded_iou_loss

        featmap_sizes = [p.shape[1:3] for p in cls_scores]
        B = cls_scores[0].shape[0]

        # ---- loc loss (focal on center regions)
        loc_t, loc_w = self._loc_targets(gt_bboxes, gt_valid, featmap_sizes)
        loc_flat = jnp.concatenate([p.reshape(B, -1) for p in loc_preds], 1)
        t_flat = jnp.concatenate(loc_t, 1)
        w_flat = jnp.concatenate(loc_w, 1)
        num_pos_loc = jnp.maximum(jnp.sum(t_flat), 1.0)
        loss_loc = jnp.sum(sigmoid_focal_loss_with_logits(
            loc_flat, t_flat) * w_flat) / num_pos_loc

        # ---- shape loss: approx-assign gts to cells, bounded-IoU on
        # predicted anchors (dx=dy=0)
        approx_gens = self.approx_generators()
        square_gens = self.square_generators()
        approx_all, square_all = [], []
        for lvl, fs in enumerate(featmap_sizes):
            approx_all.append(approx_gens[lvl].grid_anchors(
                fs, self.anchor_strides[lvl]))
            square_all.append(square_gens[lvl].grid_anchors(
                fs, self.anchor_strides[lvl]))
        approxs = jnp.concatenate(approx_all)   # (C*A, 4)
        squares = jnp.concatenate(square_all)   # (C, 4)
        A = self.num_approx
        C = squares.shape[0]

        # shape-branch assigner thresholds (ref: train_cfg.ga_assigner =
        # ApproxMaxIoUAssigner(pos_iou_thr=0.5, neg_iou_thr=0.4,
        # min_pos_iou=0.0) in the ga configs)
        ga_cfg = dict(train_cfg.get("ga_assigner", {}))

        def assign_one(gb, gv):
            # ApproxMaxIoUAssigner: per-cell IoU = max over its A approxs
            ious = bbox_overlaps(gb, approxs)              # (G, C*A)
            ious = ious.reshape(gb.shape[0], C, A).max(-1)  # (G, C)
            from ...core.bbox.assigners import assign_max_iou
            res = assign_max_iou(
                ious, gv, jnp.ones((C,), bool), None,
                pos_iou_thr=ga_cfg.get("pos_iou_thr", 0.5),
                neg_iou_thr=ga_cfg.get("neg_iou_thr", 0.4),
                min_pos_iou=ga_cfg.get("min_pos_iou", 0.0))
            pos = res.gt_inds > 0
            safe = jnp.clip(res.gt_inds - 1, 0, gb.shape[0] - 1)
            return pos, gb[safe]

        pos_mask, matched_gt = jax.vmap(assign_one)(gt_bboxes, gt_valid)

        shape_flat = jnp.concatenate(
            [p.reshape(B, -1, 2) for p in shape_preds], 1)  # (B, C, 2)
        deltas = jnp.concatenate([jnp.zeros_like(shape_flat), shape_flat], -1)
        pred_anchors = jax.vmap(
            lambda d: delta2bbox(squares, d, self.anchoring_means,
                                 self.anchoring_stds, wh_ratio_clip=1e-6)
        )(deltas)                                           # (B, C, 4)
        num_pos_shape = jnp.maximum(jnp.sum(pos_mask), 1.0)
        loss_shape = jnp.sum(bounded_iou_loss(
            pred_anchors.reshape(-1, 4), matched_gt.reshape(-1, 4),
            reduction="none", beta=0.2).sum(-1) *
            pos_mask.reshape(-1)) / num_pos_shape

        # ---- cls/reg loss on predicted anchors via the standard machinery
        pred_anchors_sg = jax.lax.stop_gradient(pred_anchors)
        assigner = MaxIoUAssigner(**{k: v for k, v in
                                     train_cfg["assigner"].items()
                                     if k != "type"})

        def per_image(anchors_i, vf, gb, gv, gl, shape):
            from ...core.anchor.anchor_target import anchor_target_single
            return anchor_target_single(
                anchors_i, vf, gb, gv, gl, shape, assigner,
                self.target_means, self.target_stds,
                allowed_border=train_cfg.get("allowed_border", -1))

        valid = jnp.ones((B, C), bool)
        labels, lw, bt, bw, pgb, npos, nneg = jax.vmap(per_image)(
            pred_anchors_sg, valid, gt_bboxes, gt_valid, gt_labels,
            img_shapes)
        num_pos = jnp.maximum(jnp.sum(npos), 1).astype(jnp.float32)
        cls_flat = jnp.concatenate(
            [p.reshape(B, -1, self.cls_out_channels) for p in cls_scores], 1)
        reg_flat = jnp.concatenate(
            [p.reshape(B, -1, 4) for p in bbox_preds], 1)
        loss_cls = self._loss_cls_fn()(
            cls_flat.reshape(-1, self.cls_out_channels), labels.reshape(-1),
            weight=lw.reshape(-1), avg_factor=num_pos)
        loss_bbox = self._loss_bbox_fn()(
            reg_flat.reshape(-1, 4), bt.reshape(-1, 4),
            weight=bw.reshape(-1, 4), avg_factor=num_pos)
        return dict(loss_cls=loss_cls, loss_bbox=loss_bbox,
                    loss_shape=loss_shape, loss_loc=loss_loc)

    # ------------------------------------------------------------------ decode

    def decode_candidates(self, cls_scores, bbox_preds, shape_preds, loc_preds,
                          img_shapes, test_cfg):
        nms_pre = test_cfg.get("nms_pre", 1000)
        featmap_sizes = [p.shape[1:3] for p in cls_scores]
        anchors = self.predicted_anchors(shape_preds, featmap_sizes)
        n_lvl = len(cls_scores)

        def single(img_shape, *flat):
            scores_l = flat[:n_lvl]
            box_l = flat[n_lvl:2 * n_lvl]
            loc_l = flat[2 * n_lvl:3 * n_lvl]
            anch_l = flat[3 * n_lvl:]
            cand_b, cand_s = [], []
            for lvl in range(n_lvl):
                h, w, _ = scores_l[lvl].shape
                n = h * w
                p = jax.nn.sigmoid(
                    scores_l[lvl].reshape(n, self.cls_out_channels))
                loc = jax.nn.sigmoid(loc_l[lvl].reshape(n))
                p = p * (loc > self.loc_filter_thr)[:, None]
                pairs = jnp.concatenate(
                    [anch_l[lvl], box_l[lvl].reshape(n, 4)], -1)
                p, _, pairs = self._level_topk(p, None, pairs,
                                               min(nms_pre, n))
                boxes = delta2bbox(pairs[:, :4], pairs[:, 4:],
                                   self.target_means, self.target_stds)
                cand_b.append(clip_boxes(boxes, img_shape))
                cand_s.append(p)
            return jnp.concatenate(cand_b), jnp.concatenate(cand_s)

        args = (list(cls_scores) + list(bbox_preds) + list(loc_preds) +
                list(anchors))
        return jax.vmap(single)(img_shapes, *args)

    def get_bboxes(self, cls_scores, bbox_preds, shape_preds, loc_preds,
                   img_shapes, scale_factors, pad_shapes, test_cfg,
                   rescale: bool = False):
        boxes, scores = self.decode_candidates(
            cls_scores, bbox_preds, shape_preds, loc_preds, img_shapes,
            test_cfg)
        return _batched_nms(boxes, scores, scale_factors, test_cfg, rescale)


@HEADS.register_module
class GARetinaHead(GuidedAnchorHead):
    """Guided-anchoring RetinaNet head: 4-conv towers before the GA branches
    (ref: ga_retina_head.py)."""

    stacked_convs: int = 4

    @nn.compact
    def __call__(self, feats, train: bool = False):
        cls_convs = [nn.Conv(self.feat_channels, (3, 3), padding=1,
                             kernel_init=_CONV_INIT, dtype=self.dtype,
                             name=f"cls_conv{i}")
                     for i in range(self.stacked_convs)]
        reg_convs = [nn.Conv(self.feat_channels, (3, 3), padding=1,
                             kernel_init=_CONV_INIT, dtype=self.dtype,
                             name=f"reg_conv{i}")
                     for i in range(self.stacked_convs)]
        branches = self.branches()
        outs = []
        for x in feats:
            cls_feat, reg_feat = x, x
            for c in cls_convs:
                cls_feat = nn.relu(c(cls_feat))
            for c in reg_convs:
                reg_feat = nn.relu(c(reg_feat))
            # GA branches run on the cls tower (loc/shape) + both towers
            conv_loc, conv_shape, adaption, conv_cls, conv_reg = branches
            loc_pred = conv_loc(cls_feat)
            shape_pred = conv_shape(reg_feat)
            adapted_cls = adaption(cls_feat, shape_pred)
            adapted_reg = adaption(reg_feat, shape_pred)
            outs.append((conv_cls(adapted_cls), conv_reg(adapted_reg),
                         shape_pred, loc_pred))
        return tuple(map(list, zip(*outs)))


@HEADS.register_module
class GARPNHead(GuidedAnchorHead):
    """Guided-anchoring RPN (ref: ga_rpn_head.py): shared 3x3 trunk then GA
    branches, binary objectness."""

    num_classes: int = 2

    @nn.compact
    def __call__(self, feats, train: bool = False):
        trunk = nn.Conv(self.feat_channels, (3, 3), padding=1,
                        kernel_init=_CONV_INIT, dtype=self.dtype,
                        name="rpn_conv")
        branches = self.branches()
        outs = []
        for x in feats:
            t = nn.relu(trunk(x))
            outs.append(self.forward_single(t, branches))
        return tuple(map(list, zip(*outs)))
