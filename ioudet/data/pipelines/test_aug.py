"""Multi-scale/flip TTA wrapper (ref: mmdet/datasets/pipelines/test_aug.py
(MultiScaleFlipAug)): duplicates the inner pipeline per (scale, flip) view
and returns a list of samples."""

from __future__ import annotations

import copy
from typing import List, Sequence

from ..registry import PIPELINES
from .compose import Compose


@PIPELINES.register_module
class MultiScaleFlipAug:
    def __init__(self, transforms: Sequence[dict], img_scale,
                 flip: bool = False):
        self.transforms = Compose(transforms)
        self.img_scales = img_scale if isinstance(img_scale, list) else [img_scale]
        self.flip = flip

    def __call__(self, results: dict) -> List[dict]:
        aug_samples = []
        flips = [False, True] if self.flip else [False]
        for scale in self.img_scales:
            for f in flips:
                r = copy.deepcopy(results)
                r["scale_override"] = tuple(scale)
                r["flip_override"] = f
                r = self.transforms(r)
                aug_samples.append(r)
        return aug_samples
