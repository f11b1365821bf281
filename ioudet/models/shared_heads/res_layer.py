"""Shared res5 head (ref capability: mmdet/models/shared_heads/
res_layer.py (ResLayer)).

C4-style two-stage detectors (Faster R-CNN without FPN) extract RoIs from
the stride-16 C4 map and run ResNet's LAST stage (res5, stride 2 inside
the RoI) as a shared trunk over the pooled 14x14 features before the box
head.  This module instantiates that stage exactly as the backbone would
(Bottleneck blocks, FrozenBN by default), so converted torchvision /
reference weights map 1:1.

TPU notes: the RoI batch (B*512, 14, 14, 1024) is a large dense conv
workload — MXU-friendly with zero change; frozen-BN folds into the convs.
"""

from __future__ import annotations

from typing import Any, Tuple

import flax.linen as nn
import jax.numpy as jnp

from ..backbones.resnet import ARCH_SETTINGS, Bottleneck
from ..registry import HEADS


@HEADS.register_module
class ResLayer(nn.Module):
    depth: int = 50
    stage: int = 3              # res5 (0-indexed stage 3)
    stride: int = 2
    style: str = "pytorch"      # C4 reference configs use 'caffe'
    norm_cfg: Any = None        # default FrozenBN like detection backbones
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        block_cls, stage_blocks = ARCH_SETTINGS[self.depth]
        assert block_cls is Bottleneck, "ResLayer supports bottleneck depths"
        num_blocks = stage_blocks[self.stage]
        planes = 64 * 2 ** self.stage
        norm = dict(self.norm_cfg or dict(type="FrozenBN"))
        for j in range(num_blocks):
            stride = self.stride if j == 0 else 1
            downsample = j == 0
            x = block_cls(planes=planes, stride=stride,
                          downsample=downsample, style=self.style,
                          norm_cfg=norm,
                          dtype=self.dtype, name=f"layer{self.stage + 1}_"
                                                 f"block{j}")(x, train=train)
        return x
