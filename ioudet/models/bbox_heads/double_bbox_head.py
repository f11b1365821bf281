"""Double-Head R-CNN box head (ref capability: mmdet/models/bbox_heads/
double_bbox_head.py (DoubleConvFCBBoxHead) + mmdet/models/detectors/
double_head_rcnn.py).

The Double-Head idea ("Rethinking Classification and Localization for
Object Detection"): classification likes fully-connected features,
localization likes convolutional ones.  So the RoI feature is routed
through TWO trunks:

  * conv branch (localization): BasicResBlock lifting 256->1024, then
    ``num_convs`` bottleneck residual blocks, global average pool, linear
    reg (class-specific 4C deltas);
  * fc branch (classification): flatten, ``num_fcs`` 1024-d FCs, linear
    cls (softmax incl. background).

TPU notes: both branches are dense batched matmul/conv work over the
(B*512, 7, 7, 256) RoI tensor — MXU-friendly as-is; BN inside the residual
blocks runs in train-mode batch stats over the RoI batch like the
reference.  The head keeps BBoxHead's (cls_score, bbox_pred) contract, so
DoubleHeadRCNN is pure registration — the fixed-shape two-stage pipeline
is reused unchanged.
"""

from __future__ import annotations

from typing import Any

import flax.linen as nn
import jax.numpy as jnp

from ..registry import HEADS
from ..utils.layers import ConvModule
from .bbox_head import BBoxHead


class BasicResBlock(nn.Module):
    """3x3 conv (norm+relu) -> 1x1 conv (norm) + 1x1 projected identity,
    ReLU after the sum (ref: double_bbox_head.py BasicResBlock)."""

    out_channels: int = 1024
    norm_cfg: Any = None
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        norm = dict(self.norm_cfg or dict(type="BN"))
        identity = ConvModule(self.out_channels, (1, 1), norm_cfg=norm,
                              act=None, dtype=self.dtype,
                              name="conv_identity")(x, train=train)
        x = ConvModule(x.shape[-1], (3, 3), norm_cfg=norm, act="relu",
                       dtype=self.dtype, name="conv1")(x, train=train)
        x = ConvModule(self.out_channels, (1, 1), norm_cfg=norm, act=None,
                       dtype=self.dtype, name="conv2")(x, train=train)
        return nn.relu(x + identity)


class _Bottleneck(nn.Module):
    """1x1 -> 3x3 -> 1x1 residual bottleneck at fixed width (planes =
    channels // 4), identity shortcut — the conv-branch block."""

    channels: int = 1024
    norm_cfg: Any = None
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        norm = dict(self.norm_cfg or dict(type="BN"))
        planes = self.channels // 4
        out = ConvModule(planes, (1, 1), norm_cfg=norm, act="relu",
                         dtype=self.dtype, name="conv1")(x, train=train)
        out = ConvModule(planes, (3, 3), norm_cfg=norm, act="relu",
                         dtype=self.dtype, name="conv2")(out, train=train)
        out = ConvModule(self.channels, (1, 1), norm_cfg=norm, act=None,
                         dtype=self.dtype, name="conv3")(out, train=train)
        return nn.relu(out + x)


@HEADS.register_module
class DoubleConvFCBBoxHead(BBoxHead):
    num_convs: int = 4
    num_fcs: int = 2
    conv_out_channels: int = 1024
    fc_out_channels: int = 1024
    norm_cfg: Any = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        # conv branch -> bbox regression
        r = BasicResBlock(self.conv_out_channels, self.norm_cfg,
                          dtype=self.dtype, name="res_block")(x, train=train)
        for i in range(self.num_convs):
            r = _Bottleneck(self.conv_out_channels, self.norm_cfg,
                            dtype=self.dtype,
                            name=f"conv_branch{i}")(r, train=train)
        r = r.mean(axis=(1, 2))  # global average pool
        reg_dim = 4 if self.reg_class_agnostic else 4 * self.num_classes
        bbox_pred = nn.Dense(reg_dim, dtype=self.dtype, name="fc_reg")(r)

        # fc branch -> classification
        f = x.reshape(x.shape[0], -1)
        for i in range(self.num_fcs):
            f = nn.relu(nn.Dense(self.fc_out_channels, dtype=self.dtype,
                                 name=f"fc_branch{i}")(f))
        cls_score = nn.Dense(self.num_classes, dtype=self.dtype,
                             name="fc_cls")(f)
        return cls_score, bbox_pred
