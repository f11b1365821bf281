from .registry import BACKBONES, NECKS, HEADS, LOSSES, DETECTORS
from .builder import (build_backbone, build_neck, build_head, build_loss,
                      build_detector)
from . import (backbones, necks, heads, detectors, losses, bbox_heads,
               mask_heads, roi_extractors, shared_heads,
               plugins)  # register everything

__all__ = [
    "BACKBONES", "NECKS", "HEADS", "LOSSES", "DETECTORS",
    "build_backbone", "build_neck", "build_head", "build_loss",
    "build_detector",
]
