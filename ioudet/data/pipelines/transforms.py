"""Host-side image/bbox transforms (ref: mmdet/datasets/pipelines/
transforms.py (Resize, RandomFlip, Normalize, Pad, RandomCrop, Expand,
MinIoURandomCrop, PhotoMetricDistortion) and mmcv imrescale/imnormalize).

Numerics preserved from the reference:
  * Resize keep_ratio: ``scale_factor = min(max_long/long, max_short/short)``
    (mmcv imrescale), bilinear, output size = int(dim * factor + 0.5);
  * flip mirrors boxes with the +1 convention (``x2' = w - x1 - 1``);
  * Normalize: (img - mean) / std after BGR->RGB;
  * Pad: to ``size_divisor`` or to a FIXED canvas (the TPU design: one static
    shape per orientation kills recompilation; ``pad_shape`` in img_meta is
    the pre-canvas divisor-padded shape, as in the reference).

These run in loader workers on numpy arrays.  A fused on-device jitted
preprocess for inference lives in ioudet/ops/preprocess.py.
"""

from __future__ import annotations

from typing import Optional, Sequence, Tuple

import numpy as np
from PIL import Image

try:  # cv2 gives EXACT mmcv.imresize numerics (INTER_LINEAR, no antialias)
    import cv2
    _HAS_CV2 = True
except ImportError:  # pragma: no cover - env always ships cv2
    _HAS_CV2 = False

from ..registry import PIPELINES
from ..rng import sample_rng


def imrescale_size(h: int, w: int, scale: Tuple[int, int]) -> Tuple[int, int, float]:
    """mmcv.imrescale sizing: scale=(long, short) bound."""
    max_long, max_short = max(scale), min(scale)
    factor = min(max_long / max(h, w), max_short / min(h, w))
    return int(h * factor + 0.5), int(w * factor + 0.5), factor


def imresize(img: np.ndarray, size_hw: Tuple[int, int]) -> np.ndarray:
    """Bilinear resize, bit-exact with mmcv.imresize (cv2.INTER_LINEAR,
    align_corners=False, no antialias).  PIL's antialiased bilinear is NOT
    cv2's (measured up to ~30 LSB on checkerboards — see
    tests/test_resize_parity.py), so cv2 is mandatory for mAP parity; PIL
    only remains as an import-time fallback for cv2-less environments."""
    if _HAS_CV2:
        return cv2.resize(img, (size_hw[1], size_hw[0]),
                          interpolation=cv2.INTER_LINEAR)
    pil = Image.fromarray(img.astype(np.uint8))
    out = pil.resize((size_hw[1], size_hw[0]), Image.BILINEAR)
    return np.asarray(out)


def imresize_nearest(img: np.ndarray, size_hw: Tuple[int, int]) -> np.ndarray:
    """Nearest resize for label maps (mmcv interpolation='nearest')."""
    if _HAS_CV2:
        return cv2.resize(img, (size_hw[1], size_hw[0]),
                          interpolation=cv2.INTER_NEAREST)
    pil = Image.fromarray(img)
    return np.asarray(pil.resize((size_hw[1], size_hw[0]), Image.NEAREST))


@PIPELINES.register_module
class Resize:
    """keep_ratio rescale into ``img_scale`` (long, short); stores
    scale_factor / img_shape in results."""

    def __init__(self, img_scale=(1333, 800), keep_ratio: bool = True,
                 multiscale_mode: str = "range"):
        self.img_scale = img_scale if isinstance(img_scale[0], (tuple, list)) \
            else [tuple(img_scale)]
        self.keep_ratio = keep_ratio
        self.multiscale_mode = multiscale_mode

    def _pick_scale(self):
        if len(self.img_scale) == 1:
            return self.img_scale[0]
        if self.multiscale_mode == "value":
            return sample_rng().choice(self.img_scale)
        # 'range': sample the long/short edges uniformly between endpoints
        longs = [max(s) for s in self.img_scale]
        shorts = [min(s) for s in self.img_scale]
        return (sample_rng().randint(min(longs), max(longs)),
                sample_rng().randint(min(shorts), max(shorts)))

    def __call__(self, results: dict) -> dict:
        img = results["img"]
        h, w = img.shape[:2]
        # MultiScaleFlipAug injects a per-view scale
        scale = results.get("scale_override") or self._pick_scale()
        if self.keep_ratio:
            nh, nw, factor = imrescale_size(h, w, scale)
        else:
            nh, nw = scale
            factor = np.array([nw / w, nh / h, nw / w, nh / h], np.float32)
        results["img"] = imresize(img, (nh, nw))
        results["img_shape"] = (nh, nw)
        results["scale_factor"] = factor
        if "gt_bboxes" in results and len(results["gt_bboxes"]):
            results["gt_bboxes"] = results["gt_bboxes"] * factor
        if "gt_bboxes_ignore" in results and len(results["gt_bboxes_ignore"]):
            results["gt_bboxes_ignore"] = results["gt_bboxes_ignore"] * factor
        if "proposals" in results and len(results["proposals"]):
            results["proposals"] = results["proposals"] * factor
        if "gt_semantic_seg" in results:  # label map: nearest, no interp
            results["gt_semantic_seg"] = imresize_nearest(
                results["gt_semantic_seg"], (nh, nw))
        return results


@PIPELINES.register_module
class RandomFlip:
    def __init__(self, flip_ratio: float = 0.5):
        self.flip_ratio = flip_ratio

    def __call__(self, results: dict) -> dict:
        if "flip_override" in results:
            flip = bool(results["flip_override"])
        else:
            flip = sample_rng().random() < self.flip_ratio
        results["flip"] = flip
        if flip:
            results["img"] = np.ascontiguousarray(results["img"][:, ::-1])
            h, w = results["img_shape"]
            for key in ("gt_bboxes", "gt_bboxes_ignore", "proposals"):
                if key in results and len(results[key]):
                    b = results[key].copy()
                    b[:, 0] = w - results[key][:, 2] - 1
                    b[:, 2] = w - results[key][:, 0] - 1
                    if key == "proposals" and "prop_valid" in results:
                        b[~results["prop_valid"]] = 0.0  # keep pads at 0
                    results[key] = b
            if "gt_masks" in results and len(results["gt_masks"]):
                # box-frame masks mirror with their box
                results["gt_masks"] = np.ascontiguousarray(
                    results["gt_masks"][:, :, ::-1])
            if "gt_semantic_seg" in results:
                results["gt_semantic_seg"] = np.ascontiguousarray(
                    results["gt_semantic_seg"][:, ::-1])
        return results


@PIPELINES.register_module
class Normalize:
    def __init__(self, mean=(123.675, 116.28, 103.53),
                 std=(58.395, 57.12, 57.375), to_rgb: bool = True):
        self.mean = np.asarray(mean, np.float32)
        self.std = np.asarray(std, np.float32)
        self.to_rgb = to_rgb

    def __call__(self, results: dict) -> dict:
        img = results["img"].astype(np.float32)
        if self.to_rgb and results.get("channel_order", "bgr") == "bgr":
            img = img[..., ::-1]
        results["img"] = (img - self.mean) / self.std
        results["img_norm_cfg"] = dict(mean=self.mean, std=self.std,
                                       to_rgb=self.to_rgb)
        return results


@PIPELINES.register_module
class Pad:
    """Pad to ``size_divisor`` (pad_shape) and optionally to a fixed canvas
    (``size``) — the canvas is the TPU static shape."""

    def __init__(self, size: Optional[Tuple[int, int]] = None,
                 size_divisor: Optional[int] = None, pad_val: float = 0.0,
                 orient_aware: bool = True):
        self.size = tuple(size) if size else None
        self.size_divisor = size_divisor
        self.pad_val = pad_val
        self.orient_aware = orient_aware

    def __call__(self, results: dict) -> dict:
        img = results["img"]
        h, w = img.shape[:2]
        if self.size_divisor:
            ph = int(np.ceil(h / self.size_divisor)) * self.size_divisor
            pw = int(np.ceil(w / self.size_divisor)) * self.size_divisor
        else:
            ph, pw = h, w
        results["pad_shape"] = (ph, pw)
        if self.size:
            th, tw = self.size
            # one canvas per orientation: swap for portrait images
            if self.orient_aware and (h > w) != (th > tw):
                th, tw = tw, th
        else:
            th, tw = ph, pw
        assert th >= h and tw >= w, f"canvas {self.size} < image {(h, w)}"
        canvas = np.full((th, tw) + img.shape[2:], self.pad_val, img.dtype)
        canvas[:h, :w] = img
        results["img"] = canvas
        if "gt_semantic_seg" in results:  # pad label map with ignore=255
            seg = results["gt_semantic_seg"]
            seg_canvas = np.full((th, tw), 255, seg.dtype)
            seg_canvas[:seg.shape[0], :seg.shape[1]] = seg
            results["gt_semantic_seg"] = seg_canvas
        return results


@PIPELINES.register_module
class SegRescale:
    """Downscale the semantic label map to the head's stride (ref:
    mmdet/datasets/pipelines/transforms.py (SegRescale), HTC uses 1/8)."""

    def __init__(self, scale_factor: float = 1.0):
        self.scale_factor = scale_factor

    def __call__(self, results: dict) -> dict:
        if "gt_semantic_seg" in results and self.scale_factor != 1.0:
            seg = results["gt_semantic_seg"]
            nh = int(seg.shape[0] * self.scale_factor)
            nw = int(seg.shape[1] * self.scale_factor)
            results["gt_semantic_seg"] = imresize_nearest(seg, (nh, nw))
        return results


@PIPELINES.register_module
class PhotoMetricDistortion:
    """SSD color jitter, structured exactly like the reference
    (mmdet/datasets/extra_aug.py (PhotoMetricDistortion)): brightness,
    contrast (before OR after HSV ops per a mode coin), saturation + hue in
    float HSV (degrees, [0,360)), then a random channel swap.  Runs on
    float32 pixels in [0,255] like the reference; output is NOT clipped
    (the reference doesn't clip either — Normalize consumes it directly)."""

    def __init__(self, brightness_delta=32, contrast_range=(0.5, 1.5),
                 saturation_range=(0.5, 1.5), hue_delta=18):
        self.brightness_delta = brightness_delta
        self.contrast_range = contrast_range
        self.saturation_range = saturation_range
        self.hue_delta = hue_delta

    @staticmethod
    def _to_hsv(img, order):
        if _HAS_CV2:
            code = cv2.COLOR_BGR2HSV if order == "bgr" else cv2.COLOR_RGB2HSV
            return cv2.cvtColor(img, code)
        hsv = np.asarray(Image.fromarray(
            np.clip(img, 0, 255).astype(np.uint8)).convert("HSV"), np.float32)
        hsv[..., 0] *= 360.0 / 255.0  # PIL hue byte -> degrees
        return hsv

    @staticmethod
    def _from_hsv(hsv, order):
        if _HAS_CV2:
            code = cv2.COLOR_HSV2BGR if order == "bgr" else cv2.COLOR_HSV2RGB
            return cv2.cvtColor(hsv, code)
        hsv = hsv.copy()
        hsv[..., 0] *= 255.0 / 360.0
        return np.asarray(Image.fromarray(
            np.clip(hsv, 0, 255).astype(np.uint8), "HSV").convert("RGB"),
            np.float32)

    def __call__(self, results: dict) -> dict:
        img = results["img"].astype(np.float32)
        order = results.get("channel_order", "bgr")
        if sample_rng().random() < 0.5:
            img = img + sample_rng().uniform(-self.brightness_delta,
                                       self.brightness_delta)
        mode = sample_rng().random() < 0.5  # True: contrast first, False: last
        if mode and sample_rng().random() < 0.5:
            img = img * sample_rng().uniform(*self.contrast_range)
        hsv = self._to_hsv(img, order)
        if sample_rng().random() < 0.5:
            hsv[..., 1] *= sample_rng().uniform(*self.saturation_range)
        if sample_rng().random() < 0.5:
            hsv[..., 0] += sample_rng().uniform(-self.hue_delta, self.hue_delta)
            hsv[..., 0][hsv[..., 0] > 360] -= 360
            hsv[..., 0][hsv[..., 0] < 0] += 360
        img = self._from_hsv(hsv, order)
        if not mode and sample_rng().random() < 0.5:
            img = img * sample_rng().uniform(*self.contrast_range)
        if sample_rng().random() < 0.5:
            img = img[..., sample_rng().sample(range(3), 3)]
        results["img"] = img
        return results


@PIPELINES.register_module
class Expand:
    """Random canvas expansion (SSD augmentation)."""

    def __init__(self, mean=(0, 0, 0), to_rgb=True, ratio_range=(1, 4)):
        # mean arrives in RGB order (img_norm_cfg) but fills the raw image;
        # mirror the reference: reverse it for BGR images when to_rgb=True.
        self.mean = tuple(mean[::-1]) if to_rgb else tuple(mean)
        self.mean_rgb = tuple(mean)
        self.ratio_range = ratio_range

    def __call__(self, results: dict) -> dict:
        if sample_rng().random() < 0.5:
            return results
        img = results["img"]
        fill = (self.mean_rgb
                if results.get("channel_order", "bgr") == "rgb" else self.mean)
        h, w, c = img.shape
        ratio = sample_rng().uniform(*self.ratio_range)
        eh, ew = int(h * ratio), int(w * ratio)
        top = sample_rng().randint(0, eh - h)
        left = sample_rng().randint(0, ew - w)
        canvas = np.empty((eh, ew, c), img.dtype)
        canvas[...] = fill
        canvas[top:top + h, left:left + w] = img
        results["img"] = canvas
        results["img_shape"] = (eh, ew)
        if "gt_bboxes" in results and len(results["gt_bboxes"]):
            results["gt_bboxes"] = results["gt_bboxes"] + np.array(
                [left, top, left, top], np.float32)
        return results


@PIPELINES.register_module
class MinIoURandomCrop:
    """SSD min-IoU crop: sample crops until every kept gt has IoU >= min_iou
    with the crop."""

    def __init__(self, min_ious=(0.1, 0.3, 0.5, 0.7, 0.9), min_crop_size=0.3):
        self.min_ious = (1,) + tuple(min_ious) + (0,)
        self.min_crop_size = min_crop_size

    def __call__(self, results: dict) -> dict:
        img = results["img"]
        h, w = img.shape[:2]
        boxes = results.get("gt_bboxes", np.zeros((0, 4), np.float32))
        while True:
            min_iou = sample_rng().choice(self.min_ious)
            if min_iou == 1:
                return results
            for _ in range(50):
                cw = sample_rng().uniform(self.min_crop_size * w, w)
                ch = sample_rng().uniform(self.min_crop_size * h, h)
                if ch / cw < 0.5 or ch / cw > 2:
                    continue
                left = sample_rng().uniform(0, w - cw)
                top = sample_rng().uniform(0, h - ch)
                patch = np.array([left, top, left + cw, top + ch])
                if len(boxes):
                    ix1 = np.maximum(boxes[:, 0], patch[0])
                    iy1 = np.maximum(boxes[:, 1], patch[1])
                    ix2 = np.minimum(boxes[:, 2], patch[2])
                    iy2 = np.minimum(boxes[:, 3], patch[3])
                    inter = np.clip(ix2 - ix1, 0, None) * np.clip(iy2 - iy1, 0, None)
                    area = (boxes[:, 2] - boxes[:, 0]) * (boxes[:, 3] - boxes[:, 1])
                    union = area + cw * ch - inter
                    ious = inter / np.maximum(union, 1e-10)
                    if ious.min() < min_iou:
                        continue
                    ctr = (boxes[:, :2] + boxes[:, 2:]) / 2
                    keep = ((ctr[:, 0] > patch[0]) & (ctr[:, 0] < patch[2]) &
                            (ctr[:, 1] > patch[1]) & (ctr[:, 1] < patch[3]))
                    if not keep.any():
                        continue
                    boxes_k = boxes[keep].copy()
                    boxes_k[:, 0::2] = np.clip(boxes_k[:, 0::2], patch[0], patch[2]) - patch[0]
                    boxes_k[:, 1::2] = np.clip(boxes_k[:, 1::2], patch[1], patch[3]) - patch[1]
                    results["gt_bboxes"] = boxes_k.astype(np.float32)
                    if "gt_labels" in results:
                        results["gt_labels"] = results["gt_labels"][keep]
                x1, y1, x2, y2 = patch.astype(int)
                results["img"] = img[y1:y2, x1:x2]
                results["img_shape"] = results["img"].shape[:2]
                return results


@PIPELINES.register_module
class RandomCrop:
    def __init__(self, crop_size: Tuple[int, int]):
        self.crop_size = crop_size

    def __call__(self, results: dict) -> dict:
        img = results["img"]
        h, w = img.shape[:2]
        ch = min(self.crop_size[0], h)
        cw = min(self.crop_size[1], w)
        top = sample_rng().randint(0, h - ch)
        left = sample_rng().randint(0, w - cw)
        results["img"] = img[top:top + ch, left:left + cw]
        results["img_shape"] = (ch, cw)
        if "gt_bboxes" in results and len(results["gt_bboxes"]):
            b = results["gt_bboxes"] - np.array([left, top, left, top], np.float32)
            b[:, 0::2] = np.clip(b[:, 0::2], 0, cw - 1)
            b[:, 1::2] = np.clip(b[:, 1::2], 0, ch - 1)
            keep = (b[:, 2] > b[:, 0]) & (b[:, 3] > b[:, 1])
            results["gt_bboxes"] = b[keep]
            if "gt_labels" in results:
                results["gt_labels"] = results["gt_labels"][keep]
        return results
