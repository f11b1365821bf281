"""Formatting transforms (ref: mmdet/datasets/pipelines/formating.py
(DefaultFormatBundle, Collect, ImageToTensor, ToTensor)).

The reference wraps tensors in DataContainers and pads at collate time;
the TPU-native contract instead emits FIXED-SHAPE numpy samples:
  * img on the static canvas (from Pad(size=...));
  * gt boxes/labels padded to ``max_gt`` with a validity mask;
  * scalar metas (img_shape, pad_shape, scale_factor, flip) as arrays so a
    whole batch stacks into one pytree of rectangular arrays -> zero
    recompilation, trivial collate.
"""

from __future__ import annotations

from typing import Sequence

import numpy as np

from ..registry import PIPELINES


@PIPELINES.register_module
class DefaultFormatBundle:
    """Pads annotations to fixed shapes (train path)."""

    def __init__(self, max_gt: int = 100, max_ignore: int = 20):
        self.max_gt = max_gt
        self.max_ignore = max_ignore

    def __call__(self, results: dict) -> dict:
        boxes = results.get("gt_bboxes", np.zeros((0, 4), np.float32))
        labels = results.get("gt_labels", np.zeros((0,), np.int64))
        n = min(len(boxes), self.max_gt)
        gt_bboxes = np.zeros((self.max_gt, 4), np.float32)
        gt_labels = np.zeros((self.max_gt,), np.int32)
        gt_valid = np.zeros((self.max_gt,), bool)
        gt_bboxes[:n] = boxes[:n]
        gt_labels[:n] = labels[:n]
        gt_valid[:n] = True
        results["gt_bboxes"] = gt_bboxes
        results["gt_labels"] = gt_labels
        results["gt_valid"] = gt_valid
        if "gt_bboxes_ignore" in results:
            ig = results["gt_bboxes_ignore"]
            ni = min(len(ig), self.max_ignore)
            gt_ig = np.zeros((self.max_ignore, 4), np.float32)
            ig_valid = np.zeros((self.max_ignore,), bool)
            gt_ig[:ni] = ig[:ni]
            ig_valid[:ni] = True
            results["gt_bboxes_ignore"] = gt_ig
            results["gt_ignore_valid"] = ig_valid
        if "gt_masks" in results:
            m = results["gt_masks"]
            s = m.shape[-1] if m.size else 112
            gt_masks = np.zeros((self.max_gt, s, s), np.uint8)
            gt_masks[:n] = m[:n]
            results["gt_masks"] = gt_masks
        if "gt_semantic_seg" in results:  # already canvas-shaped (Pad)
            results["gt_semantic_seg"] = np.ascontiguousarray(
                results["gt_semantic_seg"], np.int32)
        results["img"] = np.ascontiguousarray(results["img"], np.float32)
        return results


@PIPELINES.register_module
class ImageToTensor:
    """Kept for config parity; images stay NHWC numpy (TPU layout)."""

    def __init__(self, keys: Sequence[str] = ("img",)):
        self.keys = keys

    def __call__(self, results: dict) -> dict:
        for k in self.keys:
            results[k] = np.ascontiguousarray(results[k], np.float32)
        return results


@PIPELINES.register_module
class Collect:
    """Builds the final fixed-shape sample dict."""

    DEFAULT_META = ("ori_shape", "img_shape", "pad_shape", "scale_factor",
                    "flip")

    def __init__(self, keys: Sequence[str],
                 meta_keys: Sequence[str] = DEFAULT_META):
        self.keys = keys
        self.meta_keys = meta_keys

    def __call__(self, results: dict) -> dict:
        out = {}
        for k in self.keys:
            out[k] = results[k]
        for k in self.meta_keys:
            v = results.get(k)
            if k in ("ori_shape", "img_shape", "pad_shape"):
                v = np.asarray(v[:2], np.int32)
            elif k == "scale_factor":
                v = np.asarray(v, np.float32)
            elif k == "flip":
                v = np.asarray(bool(v))
            out[k] = v
        if "idx" in results:
            out["idx"] = np.asarray(results["idx"], np.int32)
        return out
