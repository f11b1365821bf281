"""RPN head (ref: mmdet/models/anchor_heads/rpn_head.py (RPNHead)).

3x3 conv + ReLU trunk, 1x1 objectness (sigmoid, 1 "class") and 1x1 reg.
Included for framework breadth (two-stage detectors are roadmap); proposal
decoding reuses the shared fixed-shape machinery.
"""

from __future__ import annotations

from typing import Tuple

import flax.linen as nn

from ..registry import HEADS
from .anchor_head import AnchorHead, _CONV_INIT


@HEADS.register_module
class RPNHead(AnchorHead):
    num_classes: int = 2
    use_sigmoid_cls: bool = True

    @nn.compact
    def __call__(self, feats, train: bool = False):
        rpn_conv = nn.Conv(self.feat_channels, (3, 3), padding=1,
                           kernel_init=_CONV_INIT, dtype=self.dtype,
                           name="rpn_conv")
        rpn_cls = nn.Conv(self.num_anchors * self.cls_out_channels, (1, 1),
                          kernel_init=_CONV_INIT, dtype=self.dtype,
                          name="rpn_cls")
        rpn_reg = nn.Conv(self.num_anchors * 4, (1, 1),
                          kernel_init=_CONV_INIT, dtype=self.dtype,
                          name="rpn_reg")
        cls_scores, bbox_preds = [], []
        for x in feats:
            t = nn.relu(rpn_conv(x))
            cls_scores.append(rpn_cls(t))
            bbox_preds.append(rpn_reg(t))
        return cls_scores, bbox_preds
