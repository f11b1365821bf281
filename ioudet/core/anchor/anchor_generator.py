"""Anchor generation (ref: mmdet/core/anchor/anchor_generator.py (AnchorGenerator)).

Parity-critical details preserved from the reference:
  * base anchors centered at ``0.5 * (base_size - 1)`` and **rounded** to
    integers (the v1 ``.round()``);
  * ``h_ratios = sqrt(ratios)``, ``w_ratios = 1/h_ratios``; scale-major
    ordering (scales vary fastest within a cell);
  * grid anchors ordered location-major (row-major over (y, x)), base anchor
    fastest — this ordering must match the head's ``reshape(-1, A*C)`` layout;
  * valid flags are computed against a *dynamic* per-image valid extent but a
    *static* feature-map shape, so everything stays fixed-shape under jit.

RetinaNet per-level generators: ``base_size = stride`` in (8,16,32,64,128),
``scales = 4 * 2**(i/3)``, ``ratios = (0.5, 1.0, 2.0)`` -> A = 9.
"""

from __future__ import annotations

from typing import Sequence, Tuple

import jax.numpy as jnp
import numpy as np


class AnchorGenerator:
    def __init__(self, base_size: float, scales: Sequence[float],
                 ratios: Sequence[float], scale_major: bool = True,
                 ctr: Tuple[float, float] | None = None):
        self.base_size = base_size
        self.scales = np.asarray(scales, dtype=np.float32)
        self.ratios = np.asarray(ratios, dtype=np.float32)
        self.scale_major = scale_major
        self.ctr = ctr
        self.base_anchors = self.gen_base_anchors()  # np (A, 4), host-computed once

    @property
    def num_base_anchors(self) -> int:
        return self.base_anchors.shape[0]

    def gen_base_anchors(self) -> np.ndarray:
        w = h = float(self.base_size)
        if self.ctr is None:
            x_ctr, y_ctr = 0.5 * (w - 1), 0.5 * (h - 1)
        else:
            x_ctr, y_ctr = self.ctr
        h_ratios = np.sqrt(self.ratios)
        w_ratios = 1.0 / h_ratios
        if self.scale_major:
            ws = (w * w_ratios[:, None] * self.scales[None, :]).reshape(-1)
            hs = (h * h_ratios[:, None] * self.scales[None, :]).reshape(-1)
        else:
            ws = (w * self.scales[:, None] * w_ratios[None, :]).reshape(-1)
            hs = (h * self.scales[:, None] * h_ratios[None, :]).reshape(-1)
        base = np.stack(
            [x_ctr - 0.5 * (ws - 1), y_ctr - 0.5 * (hs - 1),
             x_ctr + 0.5 * (ws - 1), y_ctr + 0.5 * (hs - 1)], axis=-1)
        return np.round(base).astype(np.float32)

    def grid_anchors(self, featmap_size: Tuple[int, int], stride: int) -> jnp.ndarray:
        """All anchors on a (feat_h, feat_w) grid, shape (feat_h*feat_w*A, 4).

        Static shapes — featmap_size is Python ints (fixed canvas), so the
        result is a compile-time constant under jit.
        """
        feat_h, feat_w = featmap_size
        shift_x = np.arange(0, feat_w, dtype=np.float32) * stride
        shift_y = np.arange(0, feat_h, dtype=np.float32) * stride
        xx = np.tile(shift_x, feat_h)
        yy = np.repeat(shift_y, feat_w)
        shifts = np.stack([xx, yy, xx, yy], axis=-1)  # (H*W, 4)
        all_anchors = self.base_anchors[None, :, :] + shifts[:, None, :]
        return jnp.asarray(all_anchors.reshape(-1, 4))

    def valid_flags(self, featmap_size: Tuple[int, int], valid_size) -> jnp.ndarray:
        """Boolean (feat_h*feat_w*A,) — True where the cell lies inside the
        per-image valid extent.  ``valid_size`` may be traced scalars
        (valid_h, valid_w), enabling one compiled program for all images.
        """
        feat_h, feat_w = featmap_size
        valid_h, valid_w = valid_size
        row = jnp.arange(feat_h)[:, None]  # (H,1)
        col = jnp.arange(feat_w)[None, :]  # (1,W)
        valid = (row < valid_h) & (col < valid_w)  # (H, W)
        valid = jnp.repeat(valid.reshape(-1)[:, None], self.num_base_anchors, axis=1)
        return valid.reshape(-1)
