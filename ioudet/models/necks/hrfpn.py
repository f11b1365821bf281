"""HRFPN neck (ref: mmdet/models/necks/hrfpn.py (HRFPN)): bilinearly
upsample all HRNet branches to the highest resolution (the reference's
F.interpolate(mode='bilinear')), concatenate, 1x1-reduce, then average-pool
out a pyramid with per-level 3x3 convs."""

from __future__ import annotations

from typing import Any, Sequence

import flax.linen as nn
import jax.numpy as jnp

from ..registry import NECKS
from ..utils.layers import ConvModule, resize_bilinear


@NECKS.register_module
class HRFPN(nn.Module):
    in_channels: Sequence[int] = (32, 64, 128, 256)
    out_channels: int = 256
    num_outs: int = 5
    pooling: str = "avg"
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, inputs, train: bool = False):
        assert len(inputs) == len(self.in_channels)
        target = inputs[0].shape[1:3]
        feats = [inputs[0]] + [resize_bilinear(x, target) for x in inputs[1:]]
        x = jnp.concatenate(feats, axis=-1)
        x = ConvModule(self.out_channels, (1, 1), act=None, dtype=self.dtype,
                       name="reduction")(x, train)
        outs = []
        cur = x
        for i in range(self.num_outs):
            if i > 0:
                if self.pooling == "avg":
                    cur = nn.avg_pool(x, (2 ** i, 2 ** i), strides=(2 ** i, 2 ** i))
                else:
                    cur = nn.max_pool(x, (2 ** i, 2 ** i), strides=(2 ** i, 2 ** i))
            outs.append(ConvModule(self.out_channels, (3, 3), act=None,
                                   dtype=self.dtype, name=f"fpn_{i}")(cur, train))
        return tuple(outs)
