"""Balanced Feature Pyramid (Libra R-CNN) (ref: mmdet/models/necks/bfp.py (BFP)).

Gathers all pyramid levels to one resolution, averages ("integrate"),
refines (conv here; the reference optionally uses non-local), and scatters
the residual back to every level.
"""

from __future__ import annotations

from typing import Any, Optional

import flax.linen as nn
import jax.numpy as jnp

from ..registry import NECKS
from ..utils.layers import ConvModule, resize_nearest


@NECKS.register_module
class BFP(nn.Module):
    in_channels: int = 256
    num_levels: int = 5
    refine_level: int = 2
    refine_type: Optional[str] = "conv"
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, inputs, train: bool = False):
        assert len(inputs) == self.num_levels
        target = inputs[self.refine_level].shape[1:3]
        gathered = []
        for i, x in enumerate(inputs):
            if i < self.refine_level:
                # downsample via adaptive max-pool-equivalent stride pooling
                factor = inputs[i].shape[1] // target[0]
                x = nn.max_pool(x, (factor, factor), strides=(factor, factor))
            elif i > self.refine_level:
                x = resize_nearest(x, target)
            gathered.append(x)
        bsf = sum(gathered) / len(gathered)
        if self.refine_type == "conv":
            bsf = ConvModule(self.in_channels, (3, 3), dtype=self.dtype,
                             name="refine")(bsf, train)
        outs = []
        for i, x in enumerate(inputs):
            r = bsf
            if i < self.refine_level:
                r = resize_nearest(bsf, x.shape[1:3])
            elif i > self.refine_level:
                factor = target[0] // x.shape[1]
                r = nn.max_pool(bsf, (factor, factor), strides=(factor, factor))
            outs.append(x + r)
        return tuple(outs)
