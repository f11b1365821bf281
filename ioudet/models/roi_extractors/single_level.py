"""Single-level RoI extractor (ref: mmdet/models/roi_extractors/
single_level.py (SingleRoIExtractor)).

Maps each RoI to an FPN level by scale (floor(log2(sqrt(area)/56)) around
finest_scale=56, clamped), extracts RoIAlign features from EVERY level and
combines with a one-hot level mask — the TPU-native replacement for the
reference's per-level nonzero indexing (dense compute over 4 levels beats a
gather/scatter on TPU, and keeps shapes static).
"""

from __future__ import annotations

from typing import Any, Sequence, Tuple

import flax.linen as nn
import jax.numpy as jnp

from ...ops.roi_align import roi_align


class SingleRoIExtractor(nn.Module):
    out_channels: int = 256
    featmap_strides: Tuple[int, ...] = (4, 8, 16, 32)
    roi_layer: Any = None            # dict(out_size=7, sample_num=2)
    finest_scale: int = 56

    def map_roi_levels(self, rois: jnp.ndarray) -> jnp.ndarray:
        scale = jnp.sqrt((rois[:, 3] - rois[:, 1] + 1) *
                         (rois[:, 4] - rois[:, 2] + 1))
        lvl = jnp.floor(jnp.log2(scale / self.finest_scale + 1e-6))
        return jnp.clip(lvl, 0, len(self.featmap_strides) - 1).astype(jnp.int32)

    @nn.compact
    def __call__(self, feats: Sequence[jnp.ndarray], rois: jnp.ndarray):
        cfg = dict(self.roi_layer or {})
        layer_type = cfg.get("type", "RoIAlign")
        out_size = cfg.get("out_size", 7)
        sample_num = cfg.get("sample_num", 2)
        lvls = self.map_roi_levels(rois)
        out = None
        for i, stride in enumerate(self.featmap_strides):
            if layer_type in ("DeformRoIPoolingPack",
                              "ModulatedDeformRoIPoolingPack"):
                from ...ops.deform_pool import (
                    DeformRoIPoolingPack, ModulatedDeformRoIPoolingPack)
                pack_cls = (ModulatedDeformRoIPoolingPack
                            if layer_type.startswith("Modulated")
                            else DeformRoIPoolingPack)
                f = pack_cls(out_size=out_size,
                             spatial_scale=1.0 / stride,
                             sample_num=sample_num,
                             trans_std=cfg.get("trans_std", 0.1),
                             name=f"deform_pool{i}")(feats[i], rois)
            else:
                f = roi_align(feats[i], rois, pooled_size=out_size,
                              spatial_scale=1.0 / stride,
                              sample_num=sample_num)
            m = (lvls == i).astype(f.dtype)[:, None, None, None]
            out = f * m if out is None else out + f * m
        return out  # (R, out_size, out_size, C)
