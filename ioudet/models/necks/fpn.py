"""Feature Pyramid Network (ref: mmdet/models/necks/fpn.py (FPN)).

RetinaNet configuration: in_channels=[256,512,1024,2048], out=256,
start_level=1, add_extra_convs=True, num_outs=5 -> P3..P7 with P6/P7 from
stride-2 3x3 convs on C5 (extra convs on *inputs*, the v1 default); ReLU
between extra convs only when relu_before_extra_convs (False for RetinaNet,
so P7 = conv(P6) directly).  Top-down pathway uses nearest upsampling; with
the pad-32 canvas all
upsamples are exact x2 (pure repeats — no gather).
"""

from __future__ import annotations

from typing import Any, Optional, Sequence, Tuple

import flax.linen as nn
import jax.numpy as jnp

from ..registry import NECKS
from ..utils.layers import ConvModule, resize_nearest

_XAVIER = nn.initializers.xavier_uniform()


@NECKS.register_module
class FPN(nn.Module):
    in_channels: Sequence[int] = (256, 512, 1024, 2048)
    out_channels: int = 256
    num_outs: int = 5
    start_level: int = 0
    end_level: int = -1
    add_extra_convs: bool = False
    extra_convs_on_inputs: bool = True
    relu_before_extra_convs: bool = False
    conv_cfg: Optional[dict] = None
    norm_cfg: Optional[dict] = None
    act: Optional[str] = None
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, inputs, train: bool = False):
        assert len(inputs) == len(self.in_channels)
        end = len(self.in_channels) if self.end_level == -1 else self.end_level
        used = list(inputs[self.start_level:end])

        # lateral 1x1s
        laterals = [
            ConvModule(self.out_channels, (1, 1), conv_cfg=self.conv_cfg,
                       norm_cfg=self.norm_cfg,
                       act=self.act, dtype=self.dtype, kernel_init=_XAVIER,
                       name=f"lateral_{i}")(x, train)
            for i, x in enumerate(used)
        ]
        # top-down accumulation
        for i in range(len(laterals) - 1, 0, -1):
            laterals[i - 1] = laterals[i - 1] + resize_nearest(
                laterals[i], laterals[i - 1].shape[1:3])
        # output 3x3s
        outs = [
            ConvModule(self.out_channels, (3, 3), conv_cfg=self.conv_cfg,
                       norm_cfg=self.norm_cfg,
                       act=self.act, dtype=self.dtype, kernel_init=_XAVIER,
                       name=f"fpn_{i}")(laterals[i], train)
            for i in range(len(laterals))
        ]
        # extra levels
        extra_needed = self.num_outs - len(outs)
        if extra_needed > 0:
            if self.add_extra_convs:
                src = inputs[end - 1] if self.extra_convs_on_inputs else outs[-1]
                for i in range(extra_needed):
                    # ref semantics: ReLU between extra convs ONLY when
                    # relu_before_extra_convs, never before the first (mmdet
                    # v1 FPN.forward; RetinaNet ships with it False, so
                    # P7 = conv(P6) with no activation)
                    if i > 0 and self.relu_before_extra_convs:
                        src = nn.relu(src)
                    src = ConvModule(self.out_channels, (3, 3), strides=(2, 2),
                                     conv_cfg=self.conv_cfg,
                                     norm_cfg=self.norm_cfg, act=None,
                                     dtype=self.dtype, kernel_init=_XAVIER,
                                     name=f"extra_{i}")(src, train)
                    outs.append(src)
            else:
                for _ in range(extra_needed):
                    outs.append(nn.max_pool(outs[-1], (1, 1), strides=(2, 2)))
        return tuple(outs)
