"""Component builders (ref: mmdet/models/builder.py (build_detector,
build_backbone, build_neck, build_head, build_loss)).

Configs are nested dicts with a ``type`` key; ``build_detector`` recursively
builds backbone/neck/head and threads train_cfg/test_cfg into the detector,
exactly the reference's wiring."""

from __future__ import annotations

from typing import Optional

from ..utils.registry import Registry, build_from_cfg
from .registry import BACKBONES, DETECTORS, HEADS, LOSSES, NECKS

ROI_EXTRACTORS = Registry("roi_extractor")


def _clean(cfg: dict) -> dict:
    """Lists -> tuples (hashable linen fields); None-valued keys are dropped
    so `_base_` config overrides can delete inherited keys."""
    out = {}
    for k, v in cfg.items():
        if v is None and k != "type":
            continue
        out[k] = tuple(v) if isinstance(v, list) else v
    return out


def build_backbone(cfg: dict):
    return build_from_cfg(_clean(dict(cfg)), BACKBONES)


def build_neck(cfg: dict):
    return build_from_cfg(_clean(dict(cfg)), NECKS)


def build_head(cfg: dict):
    return build_from_cfg(_clean(dict(cfg)), HEADS)


def build_loss(cfg: dict):
    return build_from_cfg(dict(cfg), LOSSES)


def build_roi_extractor(cfg: dict):
    from .roi_extractors import SingleRoIExtractor  # ensure registration
    cfg = dict(cfg)
    t = cfg.pop("type", "SingleRoIExtractor")
    cls = ROI_EXTRACTORS.get(t) or {"SingleRoIExtractor": SingleRoIExtractor}[t]
    return cls(**_clean(cfg))


def build_detector(cfg: dict, train_cfg: Optional[dict] = None,
                   test_cfg: Optional[dict] = None):
    """Recursively build a detector from config (single- or two-stage)."""
    cfg = dict(cfg)
    dtype = cfg.pop("dtype", None)
    det_type = cfg.pop("type")
    cfg.pop("pretrained", None)  # weight loading is explicit (checkpoint API)

    def _with_dtype(c):
        c = dict(c)
        if dtype is not None:
            c.setdefault("dtype", dtype)
        return c

    # config-deleted components arrive as explicit None (e.g. an RPN-only
    # model derived from a two-stage base) — drop them before dispatch
    for k in [k for k, v in cfg.items() if v is None and k != "type"]:
        cfg.pop(k)

    parts = dict(backbone=build_backbone(_with_dtype(cfg.pop("backbone"))))
    neck_cfg = cfg.pop("neck", None)
    if neck_cfg is not None:
        if isinstance(neck_cfg, (list, tuple)):  # chained necks (FPN -> BFP)
            from .necks import NeckSequence
            parts["neck"] = NeckSequence(tuple(
                build_neck(_with_dtype(n)) for n in neck_cfg))
        else:
            parts["neck"] = build_neck(_with_dtype(neck_cfg))
    # single-stage: bare bbox_head, no RoI machinery
    if ("bbox_head" in cfg and "rpn_head" not in cfg
            and "bbox_roi_extractor" not in cfg):
        parts["bbox_head"] = build_head(_with_dtype(cfg.pop("bbox_head")))
    # RoI-based families (two-stage, cascade, FastRCNN w/o RPN)
    if "rpn_head" in cfg:
        parts["rpn_head"] = build_head(_with_dtype(cfg.pop("rpn_head")))
    if "bbox_roi_extractor" in cfg:
        parts["bbox_roi_extractor"] = build_roi_extractor(
            cfg.pop("bbox_roi_extractor"))
        if "bbox_head" in cfg:
            hc = cfg.pop("bbox_head")
            if isinstance(hc, (list, tuple)):  # cascade: one head per stage
                parts["bbox_head"] = tuple(build_head(_with_dtype(h))
                                           for h in hc)
            else:
                parts["bbox_head"] = build_head(_with_dtype(hc))
        for ext_key in ("mask_roi_extractor", "grid_roi_extractor",
                        "semantic_roi_extractor"):
            if cfg.get(ext_key) is not None:
                parts[ext_key] = build_roi_extractor(cfg.pop(ext_key))
        if cfg.get("mask_head") is not None:
            mh = cfg.pop("mask_head")
            if isinstance(mh, (list, tuple)):  # HTC: one mask head per stage
                parts["mask_head"] = tuple(build_head(_with_dtype(h))
                                           for h in mh)
            else:
                parts["mask_head"] = build_head(_with_dtype(mh))
        for head_key in ("mask_iou_head", "grid_head", "semantic_head",
                         "shared_head"):
            if cfg.get(head_key) is not None:
                parts[head_key] = build_head(_with_dtype(cfg.pop(head_key)))
    det_cls = DETECTORS.get(det_type)
    if det_cls is None:
        raise KeyError(f"{det_type} is not a registered detector")
    return det_cls(train_cfg=_freeze(train_cfg), test_cfg=_freeze(test_cfg),
                   **parts, **cfg)


def _freeze(cfg):
    """Configs become linen-module fields; make them hashable-stable dicts."""
    if cfg is None:
        return None
    if isinstance(cfg, dict):
        return {k: _freeze(v) for k, v in cfg.items()}
    if isinstance(cfg, (list, tuple)):
        return tuple(_freeze(v) for v in cfg)
    return cfg
