"""Fused semantic head for HTC (ref capability: mmdet/models/mask_heads/
fused_semantic_head.py (FusedSemanticHead)).

HTC's semantic branch: fuse all FPN levels onto one reference level
(default level 1, stride 8) by lateral 1x1 convs + resize-sum, run a small
conv tower, and emit
  * ``seg_pred`` — per-pixel semantic logits (COCO-stuff 183 classes)
    trained with CE against the (downsampled) semantic seg map, and
  * ``feat``    — a 256-channel embedding map that the box/mask branches
    RoIAlign and add to their RoI features (the "semantic feature" of the
    paper).

TPU notes: resize is the same floor-indexed nearest used by the FPN
top-down path (one gather, fuses into the following conv); everything is
static-shaped per canvas.
"""

from __future__ import annotations

from typing import Any, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from ..registry import HEADS
from ..utils.layers import ConvModule, resize_nearest


@HEADS.register_module
class FusedSemanticHead(nn.Module):
    num_ins: int = 5
    fusion_level: int = 1
    num_convs: int = 4
    in_channels: int = 256
    conv_out_channels: int = 256
    num_classes: int = 183           # COCO stuff+things
    loss_weight: float = 0.2
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, feats, train: bool = False):
        ref = feats[self.fusion_level]
        size = ref.shape[1:3]
        x = ConvModule(self.in_channels, (1, 1), act="relu",
                       dtype=self.dtype,
                       name=f"lateral{self.fusion_level}")(ref, train=train)
        for i, f in enumerate(feats[:self.num_ins]):
            if i == self.fusion_level:
                continue
            lat = ConvModule(self.in_channels, (1, 1), act="relu",
                             dtype=self.dtype,
                             name=f"lateral{i}")(f, train=train)
            x = x + resize_nearest(lat, size)
        for i in range(self.num_convs):
            x = ConvModule(self.conv_out_channels, (3, 3), act="relu",
                           dtype=self.dtype,
                           name=f"conv{i}")(x, train=train)
        feat = ConvModule(self.conv_out_channels, (1, 1), act="relu",
                          dtype=self.dtype,
                          name="conv_embedding")(x, train=train)
        seg_pred = nn.Conv(self.num_classes, (1, 1), dtype=self.dtype,
                           name="conv_logits")(x)
        return seg_pred, feat

    def loss(self, seg_pred, gt_semantic_seg, ignore_index: int = 255):
        """seg_pred (B, H, W, C) logits at stride-8; gt_semantic_seg
        (B, H, W) int labels on the same grid (the loader downsamples the
        label map 1/8 with nearest, as the reference does)."""
        valid = (gt_semantic_seg != ignore_index)
        safe = jnp.where(valid, gt_semantic_seg, 0)
        logp = jax.nn.log_softmax(seg_pred.astype(jnp.float32), axis=-1)
        ll = jnp.take_along_axis(logp, safe[..., None], axis=-1)[..., 0]
        ce = -(ll * valid)
        return self.loss_weight * jnp.sum(ce) / jnp.maximum(
            jnp.sum(valid), 1.0)
