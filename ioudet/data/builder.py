"""Dataset builder (ref: mmdet/datasets/builder.py (build_dataset))."""

from __future__ import annotations

import copy

from ..utils.registry import build_from_cfg
from .registry import DATASETS
from .datasets.wrappers import ConcatDataset, RepeatDataset


def build_dataset(cfg: dict):
    cfg = copy.deepcopy(dict(cfg))
    if cfg["type"] == "RepeatDataset":
        return RepeatDataset(build_dataset(cfg["dataset"]), cfg["times"])
    if cfg["type"] == "ConcatDataset":
        return ConcatDataset([build_dataset(c) for c in cfg["datasets"]])
    if isinstance(cfg.get("ann_file"), (list, tuple)):
        # list of ann files -> concat (ref behavior)
        prefixes = cfg.get("img_prefix")
        if not isinstance(prefixes, (list, tuple)):
            prefixes = [prefixes] * len(cfg["ann_file"])
        parts = []
        for af, pref in zip(cfg["ann_file"], prefixes):
            c = copy.deepcopy(cfg)
            c["ann_file"], c["img_prefix"] = af, pref
            parts.append(build_from_cfg(c, DATASETS))
        return ConcatDataset(parts)
    return build_from_cfg(cfg, DATASETS)
