"""FCN mask head (ref: mmdet/models/mask_heads/fcn_mask_head.py
(FCNMaskHead)): 4x (3x3 conv + ReLU) on 14x14 RoI features, 2x deconv, 1x1
conv to per-class mask logits at 28x28.  Loss = per-pixel BCE on each
positive RoI's own class channel (ref: mask_cross_entropy)."""

from __future__ import annotations

from typing import Any

import flax.linen as nn
import jax
import jax.numpy as jnp

from ..heads.anchor_head import _CONV_INIT
from ..registry import HEADS


@HEADS.register_module
class FCNMaskHead(nn.Module):
    num_convs: int = 4
    in_channels: int = 256
    conv_out_channels: int = 256
    num_classes: int = 81
    # gn / gn+ws family support (ref: configs/gn/ mask heads carry GN)
    conv_cfg: Any = None
    norm_cfg: Any = None
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        from ..utils.layers import ConvModule, conv_class
        for i in range(self.num_convs):
            if self.conv_cfg is None and self.norm_cfg is None:
                x = nn.relu(nn.Conv(self.conv_out_channels, (3, 3),
                                    padding=1, kernel_init=_CONV_INIT,
                                    dtype=self.dtype, name=f"conv{i}")(x))
            else:
                x = ConvModule(self.conv_out_channels, (3, 3), padding=1,
                               conv_cfg=self.conv_cfg,
                               norm_cfg=self.norm_cfg,
                               kernel_init=_CONV_INIT, dtype=self.dtype,
                               name=f"conv{i}")(x, train)
        x = nn.relu(nn.ConvTranspose(self.conv_out_channels, (2, 2),
                                     strides=(2, 2), dtype=self.dtype,
                                     name="upsample")(x))
        return nn.Conv(self.num_classes - 1, (1, 1), kernel_init=_CONV_INIT,
                       dtype=self.dtype, name="conv_logits")(x)

    @staticmethod
    def loss(mask_pred, mask_targets, labels, pos_mask):
        """mask_pred (R, 28, 28, C-1); targets (R, 28, 28); labels (R,)
        1-based; pos_mask (R,)."""
        from ..losses.cross_entropy_loss import binary_cross_entropy_with_logits

        C = mask_pred.shape[-1]
        safe = jnp.clip(labels - 1, 0, C - 1)
        per_cls = jnp.take_along_axis(
            mask_pred, safe[:, None, None, None], axis=-1)[..., 0]
        bce = binary_cross_entropy_with_logits(per_cls, mask_targets)
        per_roi = bce.mean(axis=(1, 2)) * pos_mask
        return jnp.sum(per_roi) / jnp.maximum(jnp.sum(pos_mask), 1.0)


@HEADS.register_module
class HTCMaskHead(FCNMaskHead):
    """FCN mask head with HTC's mask information flow (ref capability:
    mmdet/models/mask_heads/htc_mask_head.py): an optional ``res_feat``
    from the previous stage's mask head is 1x1-conv'd and summed into the
    input; the pre-upsample conv feature is returned alongside the logits
    so the next stage can consume it."""

    @nn.compact
    def __call__(self, x, res_feat=None, train: bool = False,
                 return_feat: bool = False):
        if res_feat is not None:
            x = x + nn.Conv(self.conv_out_channels, (1, 1),
                            kernel_init=_CONV_INIT, dtype=self.dtype,
                            name="conv_res")(res_feat)
        for i in range(self.num_convs):
            x = nn.relu(nn.Conv(self.conv_out_channels, (3, 3), padding=1,
                                kernel_init=_CONV_INIT, dtype=self.dtype,
                                name=f"conv{i}")(x))
        feat = x
        x = nn.relu(nn.ConvTranspose(self.conv_out_channels, (2, 2),
                                     strides=(2, 2), dtype=self.dtype,
                                     name="upsample")(x))
        logits = nn.Conv(self.num_classes - 1, (1, 1),
                         kernel_init=_CONV_INIT, dtype=self.dtype,
                         name="conv_logits")(x)
        return (logits, feat) if return_feat else logits
