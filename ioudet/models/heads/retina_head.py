"""RetinaNet head (ref: mmdet/models/anchor_heads/retina_head.py (RetinaHead)).

Two 4x(3x3 conv + ReLU) towers (256ch) shared across FPN levels; final 3x3
convs: ``retina_cls`` -> A * (num_classes-1) sigmoid logits, ``retina_reg``
-> A * 4 deltas.  cls bias init = -log((1-p)/p), p=0.01; weights normal(0.01).
Anchors: octave_base_scale=4, scales_per_octave=3, ratios (0.5, 1, 2) -> A=9.
"""

from __future__ import annotations

from typing import Any, Tuple

import flax.linen as nn
import jax.numpy as jnp

from ..registry import HEADS
from ..utils.layers import bias_init_with_prob
from .anchor_head import AnchorHead, _CONV_INIT


def octave_scales(octave_base_scale: int = 4, scales_per_octave: int = 3):
    return tuple(octave_base_scale * 2 ** (i / scales_per_octave)
                 for i in range(scales_per_octave))


@HEADS.register_module
class RetinaHead(AnchorHead):
    stacked_convs: int = 4
    octave_base_scale: int = 4
    scales_per_octave: int = 3
    anchor_scales: Tuple[float, ...] = octave_scales()  # derived, do not set

    def towers(self):
        """Create the shared tower modules (called inside @compact)."""
        cls_convs = [nn.Conv(self.feat_channels, (3, 3), padding=1,
                             kernel_init=_CONV_INIT, dtype=self.dtype,
                             name=f"cls_conv{i}")
                     for i in range(self.stacked_convs)]
        reg_convs = [nn.Conv(self.feat_channels, (3, 3), padding=1,
                             kernel_init=_CONV_INIT, dtype=self.dtype,
                             name=f"reg_conv{i}")
                     for i in range(self.stacked_convs)]
        retina_cls = nn.Conv(
            self.num_anchors * self.cls_out_channels, (3, 3), padding=1,
            kernel_init=_CONV_INIT,
            bias_init=nn.initializers.constant(bias_init_with_prob(0.01)),
            dtype=self.dtype, name="retina_cls")
        retina_reg = nn.Conv(self.num_anchors * 4, (3, 3), padding=1,
                             kernel_init=_CONV_INIT, dtype=self.dtype,
                             name="retina_reg")
        return cls_convs, reg_convs, retina_cls, retina_reg

    def forward_single(self, x, modules):
        cls_convs, reg_convs, retina_cls, retina_reg = modules
        cls_feat, reg_feat = x, x
        for conv in cls_convs:
            cls_feat = nn.relu(conv(cls_feat))
        for conv in reg_convs:
            reg_feat = nn.relu(conv(reg_feat))
        return retina_cls(cls_feat), retina_reg(reg_feat), reg_feat

    @nn.compact
    def __call__(self, feats, train: bool = False):
        modules = self.towers()
        cls_scores, bbox_preds = [], []
        for x in feats:
            cls, reg, _ = self.forward_single(x, modules)
            cls_scores.append(cls)
            bbox_preds.append(reg)
        return cls_scores, bbox_preds
