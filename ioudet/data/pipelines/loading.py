"""Loading transforms (ref: mmdet/datasets/pipelines/loading.py
(LoadImageFromFile, LoadAnnotations, LoadProposals))."""

from __future__ import annotations

import os

import numpy as np
from PIL import Image

from ..registry import PIPELINES


@PIPELINES.register_module
class LoadImageFromFile:
    """Reads a file into an HWC uint8 array.  The reference loads BGR via
    cv2; we load RGB via PIL and tag ``channel_order`` so Normalize's
    ``to_rgb`` handling stays consistent."""

    def __init__(self, to_float32: bool = False):
        self.to_float32 = to_float32

    def __call__(self, results: dict) -> dict:
        path = results["img_info"]["filename"]
        prefix = results.get("img_prefix")
        if prefix:
            path = os.path.join(prefix, path)
        img = np.asarray(Image.open(path).convert("RGB"))
        if self.to_float32:
            img = img.astype(np.float32)
        results["filename"] = path
        results["img"] = img
        results["channel_order"] = "rgb"
        results["img_shape"] = img.shape[:2]
        results["ori_shape"] = img.shape[:2]
        return results


@PIPELINES.register_module
class LoadAnnotations:
    """with_mask=True rasterizes each instance's polygons into a fixed
    box-frame crop (mask_size x mask_size) — the TPU-native mask
    representation (see core/mask/mask_target.py); replaces the reference's
    pycocotools RLE decode."""

    def __init__(self, with_bbox: bool = True, with_label: bool = True,
                 with_mask: bool = False, mask_size: int = 112,
                 skip_img_without_anno: bool = True):
        self.with_bbox = with_bbox
        self.with_label = with_label
        self.with_mask = with_mask
        self.mask_size = mask_size

    def __call__(self, results: dict) -> dict:
        ann = results["ann_info"]
        if self.with_bbox:
            results["gt_bboxes"] = ann["bboxes"].astype(np.float32)
            results["gt_bboxes_ignore"] = ann.get(
                "bboxes_ignore", np.zeros((0, 4), np.float32)).astype(np.float32)
        if self.with_label:
            results["gt_labels"] = ann["labels"].astype(np.int64)
        if self.with_mask:
            from ...core.mask import rasterize_polygons
            polys = ann.get("masks", [])
            crops = []
            for box, poly in zip(ann["bboxes"], polys):
                crops.append(rasterize_polygons(poly, box, self.mask_size))
            results["gt_masks"] = (
                np.stack(crops) if crops else
                np.zeros((0, self.mask_size, self.mask_size), np.uint8))
        return results


@PIPELINES.register_module
class LoadProposals:
    def __init__(self, num_max_proposals: int | None = None):
        self.num_max_proposals = num_max_proposals

    def __call__(self, results: dict) -> dict:
        proposals = results["proposals"]
        if self.num_max_proposals is not None:
            proposals = proposals[: self.num_max_proposals]
        results["proposals"] = proposals.astype(np.float32)
        return results
