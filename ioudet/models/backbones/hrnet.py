"""HRNet backbone (ref: mmdet/models/backbones/hrnet.py (HRNet, HRModule)).

High-resolution network: parallel multi-resolution branches with repeated
cross-resolution fusion.  Compact TPU-native re-implementation: all branches
are plain NHWC convs; fusions use strided convs (down) and nearest resize
(up) so everything stays fixed-shape.
"""

from __future__ import annotations

from typing import Any, Dict, Optional, Tuple

import flax.linen as nn
import jax.numpy as jnp

from ..registry import BACKBONES
from ..utils.layers import resize_nearest
from .resnet import BasicBlock, Bottleneck, _KINIT, _norm


class HRModule(nn.Module):
    num_branches: int
    num_blocks: Tuple[int, ...]
    num_channels: Tuple[int, ...]
    multiscale_output: bool = True
    norm_cfg: Optional[dict] = None
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, xs, train: bool = False):
        # per-branch residual blocks
        feats = []
        for b in range(self.num_branches):
            x = xs[b]
            for j in range(self.num_blocks[b]):
                ch = self.num_channels[b]
                down = x.shape[-1] != ch
                x = BasicBlock(planes=ch, downsample=down, norm_cfg=self.norm_cfg,
                               dtype=self.dtype, name=f"branch{b}_block{j}")(x, train)
            feats.append(x)

        n_out = self.num_branches if self.multiscale_output else 1
        outs = []
        for i in range(n_out):
            acc = None
            for j in range(self.num_branches):
                y = feats[j]
                if j > i:      # upsample j -> i
                    y = nn.Conv(self.num_channels[i], (1, 1), use_bias=False,
                                dtype=self.dtype, kernel_init=_KINIT,
                                name=f"fuse_{i}_{j}")(y)
                    y = _norm(self.norm_cfg, self.num_channels[i], self.dtype,
                              f"fuse_bn_{i}_{j}")(y)
                    y = resize_nearest(y, feats[i].shape[1:3])
                elif j < i:    # downsample j -> i with strided 3x3s
                    for k in range(i - j):
                        last = k == i - j - 1
                        ch = self.num_channels[i] if last else self.num_channels[j]
                        y = nn.Conv(ch, (3, 3), strides=(2, 2), padding=1,
                                    use_bias=False, dtype=self.dtype,
                                    kernel_init=_KINIT,
                                    name=f"fuse_{i}_{j}_{k}")(y)
                        y = _norm(self.norm_cfg, ch, self.dtype,
                                  f"fuse_bn_{i}_{j}_{k}")(y)
                        if not last:
                            y = nn.relu(y)
                acc = y if acc is None else acc + y
            outs.append(nn.relu(acc))
        return outs


@BACKBONES.register_module
class HRNet(nn.Module):
    """``extra`` follows the reference config schema: dict of stage1..stage4
    with num_modules/num_branches/num_blocks/num_channels."""

    extra: Optional[Dict] = None
    norm_cfg: Optional[dict] = None
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        cfg = self.extra or {
            "stage1": dict(num_modules=1, num_branches=1, num_blocks=(4,),
                           num_channels=(64,)),
            "stage2": dict(num_modules=1, num_branches=2, num_blocks=(4, 4),
                           num_channels=(32, 64)),
            "stage3": dict(num_modules=4, num_branches=3, num_blocks=(4, 4, 4),
                           num_channels=(32, 64, 128)),
            "stage4": dict(num_modules=3, num_branches=4, num_blocks=(4, 4, 4, 4),
                           num_channels=(32, 64, 128, 256)),
        }
        # stem: two stride-2 3x3s
        for i in range(2):
            x = nn.Conv(64, (3, 3), strides=(2, 2), padding=1, use_bias=False,
                        dtype=self.dtype, kernel_init=_KINIT, name=f"stem{i}")(x)
            x = _norm(self.norm_cfg, 64, self.dtype, f"stem_bn{i}")(x)
            x = nn.relu(x)
        # stage1: bottlenecks
        s1 = cfg["stage1"]
        for j in range(s1["num_blocks"][0]):
            planes = s1["num_channels"][0]
            # mmcv creates the projection shortcut only on a channel change
            # (stem is 64ch; w18/w32 stage1 uses planes*4 == 64 -> identity)
            down = j == 0 and x.shape[-1] != planes * 4
            x = Bottleneck(planes=planes, downsample=down,
                           norm_cfg=self.norm_cfg, dtype=self.dtype,
                           name=f"layer1_{j}")(x, train)

        xs = [x]
        stages = [s for s in ("stage2", "stage3", "stage4") if s in cfg]
        for si, stage in enumerate(stages):
            sc = cfg[stage]
            nb = sc["num_branches"]
            # transition: create/adjust branches
            new_xs = []
            for b in range(nb):
                if b < len(xs):
                    y = xs[b]
                    if y.shape[-1] != sc["num_channels"][b]:
                        y = nn.Conv(sc["num_channels"][b], (3, 3), padding=1,
                                    use_bias=False, dtype=self.dtype,
                                    kernel_init=_KINIT,
                                    name=f"{stage}_trans{b}")(y)
                        y = _norm(self.norm_cfg, sc["num_channels"][b],
                                  self.dtype, f"{stage}_trans_bn{b}")(y)
                        y = nn.relu(y)
                else:
                    y = nn.Conv(sc["num_channels"][b], (3, 3), strides=(2, 2),
                                padding=1, use_bias=False, dtype=self.dtype,
                                kernel_init=_KINIT, name=f"{stage}_trans{b}")(xs[-1])
                    y = _norm(self.norm_cfg, sc["num_channels"][b], self.dtype,
                              f"{stage}_trans_bn{b}")(y)
                    y = nn.relu(y)
                new_xs.append(y)
            xs = new_xs
            for m in range(sc["num_modules"]):
                xs = HRModule(num_branches=nb, num_blocks=sc["num_blocks"],
                              num_channels=sc["num_channels"],
                              norm_cfg=self.norm_cfg, dtype=self.dtype,
                              name=f"{stage}_module{m}")(xs, train)
        return tuple(xs)
