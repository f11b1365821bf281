"""Chained necks (ref capability: mmdet Libra R-CNN's neck=[FPN, BFP]
list config — mmdet builds an nn.Sequential of necks)."""

from __future__ import annotations

from typing import Tuple

import flax.linen as nn


class NeckSequence(nn.Module):
    necks: Tuple[nn.Module, ...]

    def __call__(self, feats, train: bool = False):
        for neck in self.necks:
            feats = neck(feats, train=train)
        return feats
