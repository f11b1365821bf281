"""ResNeXt backbone (ref: mmdet/models/backbones/resnext.py (ResNeXt)).

Grouped convolution is a first-class XLA concept (``feature_group_count``),
so ResNeXt is ResNet with ``groups``/``base_width`` threaded into the
bottleneck — the x101-64x4d config uses groups=64, base_width=4.
"""

from __future__ import annotations

import flax.linen as nn

from ..registry import BACKBONES
from .resnet import ResNet


@BACKBONES.register_module
class ResNeXt(ResNet):
    groups: int = 64
    base_width: int = 4
