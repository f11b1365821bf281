"""SSD-VGG16 backbone (ref: mmdet/models/backbones/ssd_vgg.py (SSDVGG, L2Norm)).

VGG-16 through conv5_3, fc6/fc7 as dilated 3x3 + 1x1 convs, plus the SSD
extra-conv tower; conv4_3's output is L2-normalized with a learned per-channel
scale (init 20).  Returns (conv4_3, conv7, extra1..extraN) feature maps.
"""

from __future__ import annotations

from typing import Any, Tuple

import flax.linen as nn
import jax.numpy as jnp

from ..registry import BACKBONES

_VGG16 = ((2, 64), (2, 128), (3, 256), (3, 512), (3, 512))

_EXTRA = {
    300: (256, 512, 128, 256, 128, 256, 128, 256),
    512: (256, 512, 128, 256, 128, 256, 128, 256, 128, 256),
}


class L2Norm(nn.Module):
    scale: float = 20.0
    eps: float = 1e-10

    @nn.compact
    def __call__(self, x):
        gamma = self.param("gamma", nn.initializers.constant(self.scale),
                           (x.shape[-1],))
        norm = jnp.sqrt(jnp.sum(x * x, axis=-1, keepdims=True)) + self.eps
        return gamma * x / norm


@BACKBONES.register_module
class SSDVGG(nn.Module):
    input_size: int = 300
    out_feature_indices: Tuple[int, ...] = (22, 34)  # kept for config parity
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        outs = []
        for stage, (n, ch) in enumerate(_VGG16):
            for j in range(n):
                x = nn.Conv(ch, (3, 3), padding=1, dtype=self.dtype,
                            name=f"conv{stage + 1}_{j + 1}")(x)
                x = nn.relu(x)
            if stage == 3:  # conv4_3 output, L2-normalized
                outs.append(L2Norm(name="l2norm")(x))
            if stage < 4:
                x = nn.max_pool(x, (2, 2), strides=(2, 2))
            else:
                # pool5: 3x3 stride 1 (SSD modification)
                x = nn.max_pool(x, (3, 3), strides=(1, 1),
                                padding=((1, 1), (1, 1)))
        # fc6: dilated conv, fc7: 1x1
        x = nn.relu(nn.Conv(1024, (3, 3), padding=6, kernel_dilation=(6, 6),
                            dtype=self.dtype, name="fc6")(x))
        x = nn.relu(nn.Conv(1024, (1, 1), dtype=self.dtype, name="fc7")(x))
        outs.append(x)

        extras = _EXTRA[self.input_size]
        for i in range(0, len(extras), 2):
            c1, c2 = extras[i], extras[i + 1]
            x = nn.relu(nn.Conv(c1, (1, 1), dtype=self.dtype,
                                name=f"extra{i}")(x))
            stride = 2 if i // 2 < 2 or self.input_size == 512 else 1
            pad = 1 if stride == 2 else 0
            x = nn.relu(nn.Conv(c2, (3, 3), strides=(stride, stride),
                                padding=pad, dtype=self.dtype,
                                name=f"extra{i + 1}")(x))
            outs.append(x)
        return tuple(outs)
