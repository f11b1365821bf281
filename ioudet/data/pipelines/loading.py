"""Loading transforms (ref: mmdet/datasets/pipelines/loading.py
(LoadImageFromFile, LoadAnnotations, LoadProposals))."""

from __future__ import annotations

import os

import numpy as np
from PIL import Image

try:  # cv2.imread is mmcv.imread: exact decode parity with the reference
    import cv2
    _HAS_CV2 = True
except ImportError:  # pragma: no cover
    _HAS_CV2 = False

from ..registry import PIPELINES


@PIPELINES.register_module
class LoadImageFromFile:
    """Reads a file into an HWC uint8 array.  The reference loads BGR via
    cv2 (mmcv.imread); with cv2 present we do exactly that (same JPEG IDCT,
    same channel order) and tag ``channel_order='bgr'`` so Normalize's
    ``to_rgb`` flip reproduces the reference numerics bit-for-bit.  PIL
    (RGB) is only an import-time fallback."""

    def __init__(self, to_float32: bool = False):
        self.to_float32 = to_float32

    def __call__(self, results: dict) -> dict:
        path = results["img_info"]["filename"]
        prefix = results.get("img_prefix")
        if prefix:
            path = os.path.join(prefix, path)
        if _HAS_CV2:
            img = cv2.imread(path, cv2.IMREAD_COLOR)  # HWC BGR uint8
            if img is None:
                raise FileNotFoundError(f"cv2 could not read {path}")
            order = "bgr"
        else:
            img = np.asarray(Image.open(path).convert("RGB"))
            order = "rgb"
        if self.to_float32:
            img = img.astype(np.float32)
        results["filename"] = path
        results["img"] = img
        results["channel_order"] = order
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
                 with_mask: bool = False, with_seg: bool = False,
                 mask_size: int = 112,
                 skip_img_without_anno: bool = True):
        self.with_bbox = with_bbox
        self.with_label = with_label
        self.with_mask = with_mask
        self.with_seg = with_seg
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
        if self.with_seg:
            # stuff-segmentation label map for HTC's semantic branch (ref:
            # LoadAnnotations with_seg reading seg_prefix/<img>.png)
            seg_name = ann.get("seg_map")
            if seg_name is None:
                base = os.path.basename(results["img_info"]["filename"])
                seg_name = os.path.splitext(base)[0] + ".png"
            seg_path = os.path.join(results.get("seg_prefix") or "", seg_name)
            if os.path.exists(seg_path):
                seg = np.asarray(Image.open(seg_path))
                if seg.ndim == 3:
                    seg = seg[..., 0]
                results["gt_semantic_seg"] = seg.astype(np.uint8)
            else:  # no stuff maps on disk: all-ignore (loss masks it out)
                results["gt_semantic_seg"] = np.full(
                    results["img"].shape[:2], 255, np.uint8)
        return results


@PIPELINES.register_module
class LoadProposals:
    """ref: mmdet/datasets/pipelines/loading.py (LoadProposals).

    Truncates to ``num_max_proposals`` and — fixed-shape departure — also
    ZERO-PADS to that count, emitting a ``prop_valid`` mask so the
    precomputed-proposal detectors (FastRCNN) see a static (P, 4) tensor.
    A trailing score column (the reference accepts (n, 5)) is dropped after
    score-descending sort, like the reference's usage."""

    def __init__(self, num_max_proposals: int | None = None):
        self.num_max_proposals = num_max_proposals

    def __call__(self, results: dict) -> dict:
        proposals = np.asarray(results["proposals"], np.float32)
        if proposals.ndim != 2 or proposals.shape[1] not in (4, 5):
            raise ValueError(
                f"proposals must be (n, 4|5), got {proposals.shape}")
        if proposals.shape[1] == 5:
            proposals = proposals[np.argsort(-proposals[:, 4],
                                             kind="stable")][:, :4]
        if self.num_max_proposals is not None:
            proposals = proposals[: self.num_max_proposals]
            n = len(proposals)
            padded = np.zeros((self.num_max_proposals, 4), np.float32)
            padded[:n] = proposals
            valid = np.zeros((self.num_max_proposals,), bool)
            valid[:n] = True
            results["proposals"] = padded
            results["prop_valid"] = valid
        else:
            results["proposals"] = proposals
            results["prop_valid"] = np.ones((len(proposals),), bool)
        return results
