"""FoveaBox head (ref: mmdet/models/anchor_heads/fovea_head.py (FoveaHead,
FeatureAlign)).

Anchor-free per-pixel detector: each FPN level classifies cells whose center
falls in a shrunken "fovea" region of a ground-truth box (sigma-scaled center
area) and regresses log-space normalized distances to the box corners,
normalized by a per-level base edge length.

TPU-native target assignment: the reference loops over ground truths sorted
by descending area and overwrites label maps in place so the smallest box
wins contested cells.  Here that is one fixed-shape (P, G) mask computation
per level — candidate mask (in fovea region AND in the level's scale range)
then an argmin over gt areas, which reproduces the smallest-wins overwrite
semantics without any data-dependent loop.

Losses (ref defaults): sigmoid focal (gamma=1.5, alpha=0.4) averaged by
num_pos + num_imgs, smooth-L1 (beta=0.11, w=0.75) on positives averaged by
num_pos.  Inference decodes exp(bbox_pred) corner distances around cell
centers and rides the shared fixed-shape multiclass-NMS machinery.

The align variant (``with_deform=True``, ref FeatureAlign) predicts
deformable-conv offsets from the detached exp(bbox_pred) field and realigns
the classification features before a widened (4x channels) cls subnet; our
deformable sampling uses a single deformable group (the reference defaults
to 4 groups — the offsets are shared across channels here).
"""

from __future__ import annotations

from typing import Any, Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from ..registry import HEADS
from ..utils.layers import bias_init_with_prob
from .anchor_head import _CONV_INIT, _batched_nms, build_loss, clip_boxes
from .guided_anchor_head import FeatureAdaption

INF = 1e8


@HEADS.register_module
class FoveaHead(nn.Module):
    num_classes: int = 81
    in_channels: int = 256
    feat_channels: int = 256
    stacked_convs: int = 4
    strides: Tuple[int, ...] = (8, 16, 32, 64, 128)
    base_edge_list: Tuple[int, ...] = (16, 32, 64, 128, 256)
    scale_ranges: Tuple[Tuple[float, float], ...] = (
        (1, 64), (32, 128), (64, 256), (128, 512), (256, 2048))
    sigma: float = 0.4
    with_deform: bool = False
    norm: Optional[str] = None          # "GN" in the align configs
    loss_cls: Any = None                # dict; ref default gamma=1.5 alpha=0.4
    loss_bbox: Any = None               # dict; ref default SmoothL1 b=.11 w=.75
    dtype: Any = jnp.float32

    @property
    def cls_out_channels(self) -> int:
        return self.num_classes - 1

    def _conv_block(self, ch: int, ksize: int, name: str):
        conv = nn.Conv(ch, (ksize, ksize), padding=ksize // 2,
                       use_bias=self.norm is None, kernel_init=_CONV_INIT,
                       dtype=self.dtype, name=name)
        gn = (nn.GroupNorm(num_groups=32, dtype=self.dtype, name=name + "_gn")
              if self.norm == "GN" else None)
        return conv, gn

    @nn.compact
    def __call__(self, feats, train: bool = False):
        reg_convs = [self._conv_block(self.feat_channels, 3, f"reg_conv{i}")
                     for i in range(self.stacked_convs)]
        conv_reg = nn.Conv(4, (3, 3), padding=1, kernel_init=_CONV_INIT,
                           dtype=self.dtype, name="fovea_reg")
        if self.with_deform:
            # ref FeatureAlign + widened cls subnet (feat -> 4*feat 3x3,
            # 4*feat -> 4*feat 1x1, then 3x3 classifier)
            adaption = FeatureAdaption(self.feat_channels, dtype=self.dtype,
                                       name="feature_adaption")
            cls_convs = [self._conv_block(self.feat_channels * 4, 3, "cls_conv0"),
                         self._conv_block(self.feat_channels * 4, 1, "cls_conv1")]
        else:
            adaption = None
            cls_convs = [self._conv_block(self.feat_channels, 3, f"cls_conv{i}")
                         for i in range(self.stacked_convs)]
        conv_cls = nn.Conv(self.cls_out_channels, (3, 3), padding=1,
                           kernel_init=_CONV_INIT,
                           bias_init=nn.initializers.constant(
                               bias_init_with_prob(0.01)),
                           dtype=self.dtype, name="fovea_cls")

        cls_scores, bbox_preds = [], []
        for x in feats:
            reg_feat = x
            for conv, gn in reg_convs:
                reg_feat = conv(reg_feat)
                if gn is not None:
                    reg_feat = gn(reg_feat)
                reg_feat = nn.relu(reg_feat)
            bbox_pred = conv_reg(reg_feat)
            cls_feat = x
            if adaption is not None:
                cls_feat = adaption(cls_feat, jnp.exp(bbox_pred))
            for conv, gn in cls_convs:
                cls_feat = conv(cls_feat)
                if gn is not None:
                    cls_feat = gn(cls_feat)
                cls_feat = nn.relu(cls_feat)
            cls_scores.append(conv_cls(cls_feat))
            bbox_preds.append(bbox_pred)
        return cls_scores, bbox_preds

    # --------------------------------------------------------------- targets

    def _targets_level(self, feat_size, stride, base_len, scale_range,
                       gt_bboxes, gt_valid, gt_labels):
        """One image, one level.  gt_bboxes (G, 4) raw-pixel xyxy (padded),
        returns labels (P,) int32 and log-space bbox targets (P, 4)."""
        h, w = feat_size
        iy, ix = np.divmod(np.arange(h * w), w)
        ix = jnp.asarray(ix, jnp.float32)
        iy = jnp.asarray(iy, jnp.float32)

        gw = gt_bboxes[:, 2] - gt_bboxes[:, 0]
        gh = gt_bboxes[:, 3] - gt_bboxes[:, 1]
        area = gw * gh
        edge = jnp.sqrt(jnp.maximum(area, 0.0))
        in_scale = (edge >= scale_range[0]) & (edge <= scale_range[1]) & gt_valid

        # fovea region in grid units (ref: pos_left/right/top/down with
        # ceil/floor + clamp to the feature map)
        g = gt_bboxes / stride
        half_w = 0.5 * (g[:, 2] - g[:, 0])
        half_h = 0.5 * (g[:, 3] - g[:, 1])
        left = jnp.clip(jnp.ceil(g[:, 0] + (1 - self.sigma) * half_w - 0.5),
                        0, w - 1)
        right = jnp.clip(jnp.floor(g[:, 0] + (1 + self.sigma) * half_w - 0.5),
                         0, w - 1)
        top = jnp.clip(jnp.ceil(g[:, 1] + (1 - self.sigma) * half_h - 0.5),
                       0, h - 1)
        down = jnp.clip(jnp.floor(g[:, 1] + (1 + self.sigma) * half_h - 0.5),
                        0, h - 1)
        region = ((ix[:, None] >= left[None, :]) &
                  (ix[:, None] <= right[None, :]) &
                  (iy[:, None] >= top[None, :]) &
                  (iy[:, None] <= down[None, :]))          # (P, G)
        ok = region & in_scale[None, :]
        cand = jnp.where(ok, area[None, :], INF)
        amin = jnp.argmin(cand, axis=1)                     # smallest gt wins
        has = jnp.min(cand, axis=1) < INF
        labels = jnp.where(has, gt_labels[amin], 0).astype(jnp.int32)

        sel = gt_bboxes[amin]                               # (P, 4) raw coords
        px = (ix + 0.5) * stride
        py = (iy + 0.5) * stride
        t = jnp.stack([(px - sel[:, 0]) / base_len,
                       (py - sel[:, 1]) / base_len,
                       (sel[:, 2] - px) / base_len,
                       (sel[:, 3] - py) / base_len], axis=-1)
        t = jnp.log(jnp.clip(t, 1.0 / 16, 16.0))
        t = jnp.where(has[:, None], t, 0.0)
        return labels, t

    # ------------------------------------------------------------------ loss

    def loss(self, cls_scores, bbox_preds, gt_bboxes, gt_labels, gt_valid,
             img_shapes, pad_shapes, train_cfg):
        featmap_sizes = [c.shape[1:3] for c in cls_scores]
        labels_l, targets_l = [], []
        for fs, s, bl, sr in zip(featmap_sizes, self.strides,
                                 self.base_edge_list, self.scale_ranges):
            lab, tgt = jax.vmap(
                lambda gb, gv, gl: self._targets_level(fs, s, bl, sr,
                                                       gb, gv, gl)
            )(gt_bboxes, gt_valid, gt_labels)
            labels_l.append(lab)
            targets_l.append(tgt)
        labels = jnp.concatenate(labels_l, axis=1)          # (B, P)
        targets = jnp.concatenate(targets_l, axis=1)        # (B, P, 4)

        B = labels.shape[0]
        cls_flat = jnp.concatenate(
            [c.reshape(B, -1, self.cls_out_channels) for c in cls_scores], 1)
        reg_flat = jnp.concatenate([b.reshape(B, -1, 4) for b in bbox_preds], 1)

        pos = (labels > 0).astype(jnp.float32)
        num_pos = jnp.sum(pos)
        cls_cfg = dict(self.loss_cls or dict(type="FocalLoss", gamma=1.5,
                                             alpha=0.4, loss_weight=1.0))
        # ref: avg_factor = num_pos + num_imgs (keeps the all-background
        # batch finite without a clamp)
        loss_cls = build_loss(cls_cfg)(
            cls_flat.reshape(-1, self.cls_out_channels), labels.reshape(-1),
            avg_factor=num_pos + B)
        reg_cfg = dict(self.loss_bbox or dict(type="SmoothL1Loss", beta=0.11,
                                              loss_weight=0.75))
        loss_bbox = build_loss(reg_cfg)(
            reg_flat.reshape(-1, 4), targets.reshape(-1, 4),
            weight=jnp.repeat(pos.reshape(-1)[:, None], 4, axis=1),
            avg_factor=jnp.maximum(num_pos, 1.0))
        return dict(loss_cls=loss_cls, loss_bbox=loss_bbox)

    # ---------------------------------------------------------------- decode

    def decode_candidates(self, cls_scores, bbox_preds, img_shapes, test_cfg):
        nms_pre = test_cfg.get("nms_pre", 1000)
        featmap_sizes = [c.shape[1:3] for c in cls_scores]
        n_lvl = len(cls_scores)
        centers = []
        for (h, w), s in zip(featmap_sizes, self.strides):
            iy, ix = np.divmod(np.arange(h * w), w)
            centers.append(jnp.asarray(
                np.stack([(ix + 0.5) * s, (iy + 0.5) * s], -1), jnp.float32))

        def single(img_shape, *flat):
            scores_l, box_l = flat[:n_lvl], flat[n_lvl:]
            cand_b, cand_s = [], []
            for lvl in range(n_lvl):
                hgt, wid, _ = scores_l[lvl].shape
                n = hgt * wid
                p = jax.nn.sigmoid(
                    scores_l[lvl].reshape(n, self.cls_out_channels))
                d = jnp.exp(box_l[lvl].reshape(n, 4)) * \
                    self.base_edge_list[lvl]
                k = min(nms_pre, n)
                _, idx = jax.lax.top_k(jnp.max(p, -1), k)
                c = centers[lvl][idx]
                boxes = jnp.stack([c[:, 0] - d[idx, 0], c[:, 1] - d[idx, 1],
                                   c[:, 0] + d[idx, 2], c[:, 1] + d[idx, 3]],
                                  axis=-1)
                cand_b.append(clip_boxes(boxes, img_shape))
                cand_s.append(p[idx])
            return jnp.concatenate(cand_b), jnp.concatenate(cand_s)

        args = list(cls_scores) + list(bbox_preds)
        return jax.vmap(single)(img_shapes, *args)

    def get_bboxes(self, cls_scores, bbox_preds, img_shapes, scale_factors,
                   pad_shapes, test_cfg, rescale: bool = False):
        boxes, scores = self.decode_candidates(cls_scores, bbox_preds,
                                               img_shapes, test_cfg)
        return _batched_nms(boxes, scores, scale_factors, test_cfg, rescale)
