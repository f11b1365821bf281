"""Balanced Feature Pyramid (Libra R-CNN) (ref: mmdet/models/necks/bfp.py (BFP)).

Gathers all pyramid levels to one resolution, averages ("integrate"),
refines (3x3 conv or an embedded-gaussian non-local block — the Libra
configs use ``refine_type='non_local'`` with reduction=1/use_scale=False,
matching the reference's ``NonLocal2D`` instantiation), and scatters the
residual back to every level.
"""

from __future__ import annotations

from typing import Any, Optional

import flax.linen as nn
import jax.numpy as jnp

from ..registry import NECKS
from ..utils.layers import ConvModule, adaptive_max_pool, resize_nearest


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
                # exact torch adaptive_max_pool2d semantics — real canvases
                # produce non-divisible level sizes (e.g. P5 26x42 -> P7
                # 7x11) where uniform stride pooling diverges
                x = adaptive_max_pool(x, target)
            elif i > self.refine_level:
                x = resize_nearest(x, target)
            gathered.append(x)
        bsf = sum(gathered) / len(gathered)
        if self.refine_type == "conv":
            bsf = ConvModule(self.in_channels, (3, 3), dtype=self.dtype,
                             name="refine")(bsf, train)
        elif self.refine_type == "non_local":
            from ..plugins import NonLocal2D
            bsf = NonLocal2D(reduction=1, use_scale=False, dtype=self.dtype,
                             name="refine")(bsf)
        elif self.refine_type is not None:
            raise ValueError(f"unknown refine_type {self.refine_type!r}")
        outs = []
        for i, x in enumerate(inputs):
            r = bsf
            if i < self.refine_level:
                r = resize_nearest(bsf, x.shape[1:3])
            elif i > self.refine_level:
                r = adaptive_max_pool(bsf, x.shape[1:3])
            outs.append(x + r)
        return tuple(outs)
