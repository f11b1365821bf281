"""RepPoints head (ref: mmdet/models/anchor_heads/reppoints_head.py
(RepPointsHead) + mmdet/core/anchor/point_generator.py (PointGenerator) +
mmdet/core/anchor/point_target.py (point_target)).

Anchor-free representation: each location predicts ``num_points`` (9)
offset pairs; a deformable 3x3 conv samples the feature map AT those
points (offset input = points − dcn base grid) for both classification
and refinement, so the representation and the feature sampling share one
set of points.  Boxes come from a point-set→box transform
(minmax / partial_minmax / moment with a learned, mostly-detached
``moment_transfer``).

Two-stage targets, fixed-shape:
  * init stage — PointAssigner (each gt claims its ``pos_num`` nearest
    same-level points; conflicts keep the closer gt);
  * refine stage — MaxIoUAssigner on the boxes decoded from the (detached)
    init points.
Loss = focal cls (refine labels) + SmoothL1 on stride-normalized boxes for
both stages (init weight 0.5, refine 1.0), everything batched with masks —
the reference's per-image Python loops become vmapped (P, G) tensor work.

TPU note: the deformable sampling reuses ops/deform_conv.py (bilinear
gather → one MXU matmul); offsets are NHWC (dy, dx)-interleaved, exactly
the op's native layout, so no transposes appear anywhere in the head.
"""

from __future__ import annotations

from typing import Any, Dict, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from ...core.bbox import MaxIoUAssigner, PointAssigner, bbox_overlaps
from ...ops.deform_conv import deform_conv2d
from ..registry import HEADS
from ..utils.layers import bias_init_with_prob
from .anchor_head import _CONV_INIT, _batched_nms, clip_boxes


def level_point_centers(feat_size: Tuple[int, int], stride: int) -> np.ndarray:
    """(h*w, 3) of (x, y, stride) — ref PointGenerator.grid_points (NO
    stride/2 offset, unlike FCOS)."""
    h, w = feat_size
    xs = np.arange(w, dtype=np.float32) * stride
    ys = np.arange(h, dtype=np.float32) * stride
    xx = np.tile(xs, h)
    yy = np.repeat(ys, w)
    return np.stack([xx, yy, np.full_like(xx, stride)], -1)


def points2bbox(pts: jnp.ndarray, moment_transfer: jnp.ndarray,
                transform_method: str = "moment",
                moment_mul: float = 0.01) -> jnp.ndarray:
    """(..., num_points, 2) (x, y) point sets -> (..., 4) xyxy boxes
    (ref: RepPointsHead.points2bbox; y_first handled by the caller's
    layout).  ``moment_transfer`` is the learned (2,) log-scale; the
    moment_mul mix keeps its gradient small (ref: moment_mul=0.01)."""
    px, py = pts[..., 0], pts[..., 1]
    if transform_method == "minmax":
        return jnp.stack([px.min(-1), py.min(-1), px.max(-1), py.max(-1)], -1)
    if transform_method == "partial_minmax":
        px4, py4 = px[..., :4], py[..., :4]
        return jnp.stack([px4.min(-1), py4.min(-1),
                          px4.max(-1), py4.max(-1)], -1)
    if transform_method == "moment":
        mx = px.mean(-1)
        my = py.mean(-1)
        # torch.std: Bessel-corrected (n-1 divisor)
        n = px.shape[-1]
        sx = jnp.sqrt(((px - mx[..., None]) ** 2).sum(-1) / (n - 1))
        sy = jnp.sqrt(((py - my[..., None]) ** 2).sum(-1) / (n - 1))
        mt = (moment_transfer * moment_mul
              + jax.lax.stop_gradient(moment_transfer) * (1 - moment_mul))
        hw = sx * jnp.exp(mt[0])
        hh = sy * jnp.exp(mt[1])
        return jnp.stack([mx - hw, my - hh, mx + hw, my + hh], -1)
    raise ValueError(f"unknown transform_method {transform_method}")


@HEADS.register_module
class RepPointsHead(nn.Module):
    num_classes: int = 81
    in_channels: int = 256
    feat_channels: int = 256
    point_feat_channels: int = 256
    stacked_convs: int = 3
    num_points: int = 9
    gradient_mul: float = 0.1
    point_strides: Tuple[int, ...] = (8, 16, 32, 64, 128)
    point_base_scale: int = 4
    transform_method: str = "moment"
    moment_mul: float = 0.01
    loss_cls: Any = None        # focal defaults below
    loss_bbox_init: Any = None  # SmoothL1(beta=1/9, w=0.5)
    loss_bbox_refine: Any = None  # SmoothL1(beta=1/9, w=1.0)
    dtype: Any = jnp.float32

    @property
    def cls_out_channels(self) -> int:
        return self.num_classes - 1

    # ---------------- network ---------------------------------------------

    @nn.compact
    def __call__(self, feats, train: bool = False):
        assert self.num_points == 9, "dcn sampling needs a 3x3 point grid"
        cls_convs, reg_convs = [], []
        for i in range(self.stacked_convs):
            cls_convs.append(nn.Conv(self.feat_channels, (3, 3), padding=1,
                                     kernel_init=_CONV_INIT, dtype=self.dtype,
                                     name=f"cls_conv{i}"))
            reg_convs.append(nn.Conv(self.feat_channels, (3, 3), padding=1,
                                     kernel_init=_CONV_INIT, dtype=self.dtype,
                                     name=f"reg_conv{i}"))
        pts_init_conv = nn.Conv(self.point_feat_channels, (3, 3), padding=1,
                                kernel_init=_CONV_INIT, dtype=self.dtype,
                                name="reppoints_pts_init_conv")
        pts_init_out = nn.Conv(2 * self.num_points, (1, 1),
                               kernel_init=_CONV_INIT, dtype=self.dtype,
                               name="reppoints_pts_init_out")
        # deformable 3x3 kernels (bias folded into the following 1x1s,
        # mirroring the reference's DeformConv(bias=False))
        cls_dcn_kernel = self.param(
            "reppoints_cls_conv_kernel", _CONV_INIT,
            (3, 3, self.feat_channels, self.point_feat_channels))
        refine_dcn_kernel = self.param(
            "reppoints_pts_refine_conv_kernel", _CONV_INIT,
            (3, 3, self.feat_channels, self.point_feat_channels))
        cls_out = nn.Conv(self.cls_out_channels, (1, 1),
                          kernel_init=_CONV_INIT,
                          bias_init=nn.initializers.constant(
                              bias_init_with_prob(0.01)),
                          dtype=self.dtype, name="reppoints_cls_out")
        pts_refine_out = nn.Conv(2 * self.num_points, (1, 1),
                                 kernel_init=_CONV_INIT, dtype=self.dtype,
                                 name="reppoints_pts_refine_out")

        # dcn base grid, (dy, dx) interleaved — the offset the deform conv
        # would need to degenerate to a plain 3x3 (ref: dcn_base_offset)
        ky, kx = np.meshgrid(np.arange(3) - 1, np.arange(3) - 1, indexing="ij")
        dcn_base = jnp.asarray(
            np.stack([ky, kx], -1).reshape(-1).astype(np.float32))  # (18,)

        cls_scores, pts_inits, pts_refines = [], [], []
        for x in feats:
            cls_feat, pts_feat = x, x
            for conv in cls_convs:
                cls_feat = nn.relu(conv(cls_feat))
            for conv in reg_convs:
                pts_feat = nn.relu(conv(pts_feat))
            pts_out_init = pts_init_out(nn.relu(pts_init_conv(pts_feat)))
            # mostly-detached offsets into the dcn (ref: gradient_mul=0.1)
            pts_grad = (jax.lax.stop_gradient(pts_out_init)
                        * (1 - self.gradient_mul)
                        + pts_out_init * self.gradient_mul)
            dcn_offset = (pts_grad - dcn_base).astype(self.dtype)
            cls_scores.append(cls_out(nn.relu(deform_conv2d(
                cls_feat, dcn_offset, cls_dcn_kernel.astype(self.dtype)))))
            pts_out_refine = pts_refine_out(nn.relu(deform_conv2d(
                pts_feat, dcn_offset, refine_dcn_kernel.astype(self.dtype))))
            pts_refines.append(pts_out_refine
                               + jax.lax.stop_gradient(pts_out_init))
            pts_inits.append(pts_out_init)
        moment = self.param("moment_transfer", nn.initializers.zeros, (2,))
        return cls_scores, pts_inits, pts_refines, moment

    # ---------------- geometry helpers -------------------------------------

    def _centers_and_valid(self, featmap_sizes, pad_shapes):
        """Concat-level point centers (P, 3) + per-image validity (B, P)
        (points on the padded-out border rows/cols are invalid, same rule
        as AnchorHead.get_anchors)."""
        centers = jnp.concatenate(
            [jnp.asarray(level_point_centers(fs, s))
             for fs, s in zip(featmap_sizes, self.point_strides)])

        def per_image(shape):
            flags = []
            for fs, s in zip(featmap_sizes, self.point_strides):
                h, w = fs
                vh = jnp.minimum(jnp.ceil(shape[0] / s).astype(jnp.int32), h)
                vw = jnp.minimum(jnp.ceil(shape[1] / s).astype(jnp.int32), w)
                ii = jnp.arange(h)[:, None]
                jj = jnp.arange(w)[None, :]
                flags.append(((ii < vh) & (jj < vw)).reshape(-1))
            return jnp.concatenate(flags)

        return centers, jax.vmap(per_image)(pad_shapes)

    def _abs_points(self, pts_preds, centers):
        """Per-level (B, H, W, 2N) (dy, dx)-interleaved offsets -> absolute
        (B, P, N, 2) (x, y) coordinates: center + stride * offset
        (ref: RepPointsHead.offset_to_pts)."""
        out = []
        start = 0
        for pred, stride in zip(pts_preds, self.point_strides):
            b, h, w, _ = pred.shape
            n = h * w
            # f32: bf16 loses ~4 px at canvas scale, too coarse for box math
            p = pred.reshape(b, n, self.num_points, 2).astype(jnp.float32)
            ctr = centers[start:start + n, :2]             # (n, 2) x, y
            xy = jnp.stack([p[..., 1], p[..., 0]], -1)     # dx, dy -> x, y
            out.append(xy * stride + ctr[None, :, None, :])
            start += n
        return jnp.concatenate(out, axis=1)                # (B, P, N, 2)

    def _norm_terms(self, featmap_sizes):
        """(P,) per-point normalizer: point_base_scale * stride."""
        terms = [np.full(fs[0] * fs[1], self.point_base_scale * s, np.float32)
                 for fs, s in zip(featmap_sizes, self.point_strides)]
        return jnp.asarray(np.concatenate(terms))

    # ---------------- loss --------------------------------------------------

    def loss(self, cls_scores, pts_preds_init, pts_preds_refine, moment,
             gt_bboxes, gt_labels, gt_valid, img_shapes, pad_shapes,
             train_cfg, gt_bboxes_ignore=None,
             gt_ignore_valid=None) -> Dict[str, jnp.ndarray]:
        from ..losses.focal_loss import sigmoid_focal_loss
        from ..losses.smooth_l1_loss import smooth_l1_loss

        featmap_sizes = [p.shape[1:3] for p in cls_scores]
        centers, point_valid = self._centers_and_valid(featmap_sizes,
                                                       pad_shapes)
        norm = self._norm_terms(featmap_sizes)             # (P,)

        pts_init_abs = self._abs_points(pts_preds_init, centers)
        pts_refine_abs = self._abs_points(pts_preds_refine, centers)
        bbox_init = points2bbox(pts_init_abs, moment, self.transform_method,
                                self.moment_mul)           # (B, P, 4)
        bbox_refine = points2bbox(pts_refine_abs, moment,
                                  self.transform_method, self.moment_mul)

        init_cfg = train_cfg.get("init", {}).get("assigner",
                                                 dict(scale=4, pos_num=1))
        refine_cfg = train_cfg.get("refine", {}).get(
            "assigner", dict(pos_iou_thr=0.5, neg_iou_thr=0.4,
                             min_pos_iou=0.0, ignore_iof_thr=-1))
        init_assigner = PointAssigner(
            **{k: v for k, v in init_cfg.items() if k != "type"})
        refine_assigner = MaxIoUAssigner(
            **{k: v for k, v in refine_cfg.items() if k != "type"})

        def init_single(gb, gv, gl, pv):
            r = init_assigner.assign(centers, gb, gv, pv, gt_labels=gl)
            pos = r.gt_inds > 0
            safe = jnp.clip(r.gt_inds - 1, 0, gb.shape[0] - 1)
            return pos, gb[safe] * pos[:, None]

        pos_init, bbox_gt_init = jax.vmap(init_single)(
            gt_bboxes, gt_valid, gt_labels, point_valid)

        # refine stage: assign the INIT-decoded boxes (detached) by max IoU
        proposals = jax.lax.stop_gradient(bbox_init)

        def refine_single(props, gb, gv, gl, pv, gbi, giv):
            r = refine_assigner.assign(props, gb, gv, pv, gt_labels=gl,
                                       gt_bboxes_ignore=gbi,
                                       gt_ignore_valid=giv)
            pos = r.gt_inds > 0
            safe = jnp.clip(r.gt_inds - 1, 0, gb.shape[0] - 1)
            lw = (r.gt_inds >= 0).astype(jnp.float32)      # 0 on ignore (-1)
            return pos, gb[safe] * pos[:, None], r.labels, lw

        B = gt_bboxes.shape[0]
        if gt_bboxes_ignore is None:
            gt_bboxes_ignore = jnp.zeros((B, 1, 4), jnp.float32)
            gt_ignore_valid = jnp.zeros((B, 1), bool)
        pos_ref, bbox_gt_ref, labels_ref, label_w = jax.vmap(refine_single)(
            proposals, gt_bboxes, gt_valid, gt_labels, point_valid,
            gt_bboxes_ignore, gt_ignore_valid)

        num_pos_init = jnp.maximum(jnp.sum(pos_init), 1).astype(jnp.float32)
        num_pos_ref = jnp.maximum(jnp.sum(pos_ref), 1).astype(jnp.float32)

        C = self.cls_out_channels
        cls_flat = jnp.concatenate(
            [c.reshape(B, -1, C) for c in cls_scores], 1)
        cls_cfg = dict(self.loss_cls or dict(gamma=2.0, alpha=0.25,
                                             loss_weight=1.0))
        loss_cls = cls_cfg.get("loss_weight", 1.0) * sigmoid_focal_loss(
            cls_flat.reshape(-1, C), labels_ref.reshape(-1),
            weight=label_w.reshape(-1), gamma=cls_cfg.get("gamma", 2.0),
            alpha=cls_cfg.get("alpha", 0.25), avg_factor=num_pos_ref)

        def box_loss(pred, tgt, pos, npos, cfg_attr, default_w):
            cfg = dict(cfg_attr or {})
            beta = cfg.get("beta", 1.0 / 9.0)
            w = cfg.get("loss_weight", default_w)
            nt = norm[None, :, None]
            l = smooth_l1_loss(pred / nt, tgt / nt, beta=beta)
            return w * jnp.sum(l * pos[..., None]) / npos

        loss_pts_init = box_loss(bbox_init, bbox_gt_init, pos_init,
                                 num_pos_init, self.loss_bbox_init, 0.5)
        loss_pts_refine = box_loss(bbox_refine, bbox_gt_ref, pos_ref,
                                   num_pos_ref, self.loss_bbox_refine, 1.0)
        return dict(loss_cls=loss_cls, loss_pts_init=loss_pts_init,
                    loss_pts_refine=loss_pts_refine)

    # ---------------- inference decode --------------------------------------

    def decode_candidates(self, cls_scores, pts_preds_init, pts_preds_refine,
                          moment, img_shapes, test_cfg):
        nms_pre = test_cfg.get("nms_pre", 1000)
        featmap_sizes = [p.shape[1:3] for p in cls_scores]
        lvl_centers = [jnp.asarray(level_point_centers(fs, s))
                       for fs, s in zip(featmap_sizes, self.point_strides)]
        n_lvl = len(cls_scores)

        def single(img_shape, *flat):
            scores_l = flat[:n_lvl]
            pts_l = flat[n_lvl:]
            cand_b, cand_s = [], []
            for lvl in range(n_lvl):
                h, w, _ = scores_l[lvl].shape
                n = h * w
                p = jax.nn.sigmoid(
                    scores_l[lvl].reshape(n, -1).astype(jnp.float32))
                pts = pts_l[lvl].reshape(n, self.num_points,
                                         2).astype(jnp.float32)
                xy = jnp.stack([pts[..., 1], pts[..., 0]], -1) \
                    * self.point_strides[lvl] \
                    + lvl_centers[lvl][:, None, :2]
                boxes = points2bbox(xy, moment, self.transform_method,
                                    self.moment_mul)
                k = min(nms_pre, n)
                _, idx = jax.lax.top_k(jnp.max(p, -1), k)
                cand_b.append(clip_boxes(boxes[idx], img_shape))
                cand_s.append(p[idx])
            return jnp.concatenate(cand_b), jnp.concatenate(cand_s)

        args = list(cls_scores) + list(pts_preds_refine)
        return jax.vmap(single)(img_shapes, *args)

    def get_bboxes(self, cls_scores, pts_preds_init, pts_preds_refine, moment,
                   img_shapes, scale_factors, pad_shapes, test_cfg,
                   rescale: bool = False):
        boxes, scores = self.decode_candidates(
            cls_scores, pts_preds_init, pts_preds_refine, moment,
            img_shapes, test_cfg)
        return _batched_nms(boxes, scores, scale_factors, test_cfg, rescale)
