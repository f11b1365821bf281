"""Second-stage box heads (ref: mmdet/models/bbox_heads/bbox_head.py
(BBoxHead) and convfc_bbox_head.py (ConvFCBBoxHead, SharedFCBBoxHead)).

BBoxHead: avg-pool + linear cls/reg.  SharedFCBBoxHead: the Faster R-CNN
default — two shared 1024-d FCs then linear cls (softmax, incl bg) and reg
(class-specific 4*C deltas, stds (.1, .1, .2, .2))."""

from __future__ import annotations

from typing import Any, Dict, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from ...core.bbox import bbox_overlaps, bbox2delta, delta2bbox
from ..registry import HEADS


@HEADS.register_module
class BBoxHead(nn.Module):
    num_classes: int = 81
    in_channels: int = 256
    roi_feat_size: int = 7
    with_avg_pool: bool = False
    reg_class_agnostic: bool = False
    target_means: Tuple[float, ...] = (0., 0., 0., 0.)
    target_stds: Tuple[float, ...] = (0.1, 0.1, 0.2, 0.2)
    cls_loss_weight: float = 1.0   # Double-Head trains with 2.0/2.0
    bbox_loss_weight: float = 1.0
    loss_bbox: Any = None          # config dict; default SmoothL1 beta=1
    dtype: Any = jnp.float32

    def trunk(self, x):
        if self.with_avg_pool:
            return x.mean(axis=(1, 2))
        return x.reshape(x.shape[0], -1)

    @nn.compact
    def __call__(self, x, train: bool = False):
        feat = self.trunk(x)
        cls_score = nn.Dense(self.num_classes, dtype=self.dtype,
                             name="fc_cls")(feat)
        reg_dim = 4 if self.reg_class_agnostic else 4 * self.num_classes
        bbox_pred = nn.Dense(reg_dim, dtype=self.dtype, name="fc_reg")(feat)
        return cls_score, bbox_pred

    # loss/target helpers shared by subclasses -------------------------------

    def loss(self, cls_score, bbox_pred, labels, label_weights, bbox_targets,
             bbox_weights):
        from ..builder import build_loss
        from ..losses.cross_entropy_loss import cross_entropy

        avg = jnp.maximum(jnp.sum(label_weights), 1.0)
        loss_cls = cross_entropy(cls_score, labels, weight=label_weights,
                                 avg_factor=avg)
        if not self.reg_class_agnostic:
            r = bbox_pred.reshape(bbox_pred.shape[0], self.num_classes, 4)
            safe = jnp.clip(labels, 0, self.num_classes - 1)
            bbox_pred = jnp.take_along_axis(
                r, safe[:, None, None].repeat(4, -1), axis=1)[:, 0]
        num_pos = jnp.maximum(jnp.sum(bbox_weights[:, 0] > 0), 1.0)
        # reg loss is configurable (Libra R-CNN uses BalancedL1Loss here)
        reg_fn = build_loss(dict(self.loss_bbox or
                                 dict(type="SmoothL1Loss", beta=1.0)))
        loss_bbox = reg_fn(bbox_pred, bbox_targets,
                           weight=bbox_weights, avg_factor=num_pos)
        return dict(loss_cls=loss_cls * self.cls_loss_weight,
                    loss_bbox=loss_bbox * self.bbox_loss_weight)


@HEADS.register_module
class ConvFCBBoxHead(BBoxHead):
    num_shared_convs: int = 0
    num_shared_fcs: int = 2
    fc_out_channels: int = 1024
    conv_out_channels: int = 256
    # conv_cfg=dict(type="ConvWS") + norm_cfg=dict(type="GN") -> the
    # reference's gn / gn+ws "4conv1fc" heads (ref: configs/gn/, configs/gn+ws/)
    conv_cfg: Any = None
    norm_cfg: Any = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        from ..utils.layers import ConvModule
        for i in range(self.num_shared_convs):
            x = ConvModule(self.conv_out_channels, (3, 3), padding=1,
                           conv_cfg=self.conv_cfg, norm_cfg=self.norm_cfg,
                           dtype=self.dtype, name=f"shared_conv{i}")(x, train)
        feat = x.reshape(x.shape[0], -1)
        for i in range(self.num_shared_fcs):
            feat = nn.relu(nn.Dense(self.fc_out_channels, dtype=self.dtype,
                                    name=f"shared_fc{i}")(feat))
        cls_score = nn.Dense(self.num_classes, dtype=self.dtype,
                             name="fc_cls")(feat)
        reg_dim = 4 if self.reg_class_agnostic else 4 * self.num_classes
        bbox_pred = nn.Dense(reg_dim, dtype=self.dtype, name="fc_reg")(feat)
        return cls_score, bbox_pred


@HEADS.register_module
class SharedFCBBoxHead(ConvFCBBoxHead):
    """ref: SharedFCBBoxHead — the standard 2-fc head (registration alias)."""


def bbox_target_single(rois, pos_mask, matched_gt, labels,
                       target_means=(0., 0., 0., 0.),
                       target_stds=(0.1, 0.1, 0.2, 0.2)):
    """Second-stage targets (ref: mmdet/core/bbox/bbox_target.py): encode
    matched gt against sampled proposals; weights mark participation."""
    deltas = bbox2delta(rois, matched_gt, target_means, target_stds)
    posf = pos_mask.astype(jnp.float32)
    bbox_targets = deltas * posf[:, None]
    bbox_weights = jnp.broadcast_to(posf[:, None], deltas.shape)
    labels = jnp.where(pos_mask, labels, 0).astype(jnp.int32)
    return labels, bbox_targets, bbox_weights
