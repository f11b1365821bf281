"""Inference API (ref: mmdet/apis/inference.py (init_detector,
inference_detector, show_result)).

``init_detector`` builds the detector from a config + optional checkpoint and
returns a handle with a jit-cached predict function; ``inference_detector``
takes a filename or HWC numpy image and returns the reference's result
format: a per-class list of (n, 5) numpy arrays.
"""

from __future__ import annotations

import functools
from dataclasses import dataclass, field
from typing import Any, Dict, List, Optional, Union

import jax
import jax.numpy as jnp
import numpy as np

from ..core.bbox.transforms import bbox2result
from ..data.pipelines.compose import Compose
from ..models import build_detector
from ..utils.config import Config
from .checkpoint import load_checkpoint


@dataclass
class DetectorHandle:
    detector: Any
    params: Dict
    cfg: Any
    CLASSES: Optional[tuple] = None
    _predict: Any = field(default=None, repr=False)

    def predict_fn(self):
        if self._predict is None:
            det = self.detector

            @jax.jit
            def _predict(params, img, img_shape, scale_factor, pad_shape):
                return det.apply({"params": params}, img, img_shape,
                                 scale_factor, pad_shape,
                                 method=det.simple_test)

            self._predict = _predict
        return self._predict


def init_detector(config: Union[str, Config], checkpoint: Optional[str] = None,
                  dtype=None, seed: int = 0) -> DetectorHandle:
    if isinstance(config, str):
        config = Config.fromfile(config)
    model_cfg = dict(config.model)
    if dtype is not None:
        model_cfg["dtype"] = dtype
    detector = build_detector(model_cfg, config.get("train_cfg"),
                              config.get("test_cfg"))
    # init to get the COMPLETE param structure (simple_test traces every
    # branch incl. second-stage/mask heads), then optionally restore
    pipeline_canvas = _infer_canvas(config)
    dummy = jnp.zeros((1,) + pipeline_canvas + (3,), jnp.float32)
    meta = jnp.asarray([list(pipeline_canvas)], jnp.int32)
    variables = detector.init(jax.random.PRNGKey(seed), dummy, meta,
                              jnp.ones((1,), jnp.float32), meta,
                              method=detector.simple_test)
    params = variables["params"]
    classes = None
    if checkpoint is not None:
        state, meta = load_checkpoint(checkpoint, None)
        params = state["params"] if "params" in state else state
        params = jax.tree.map(jnp.asarray, params)
        classes = meta.get("CLASSES")
    return DetectorHandle(detector, params, config, CLASSES=classes)


def _infer_canvas(cfg) -> tuple:
    """Find the fixed canvas from the test pipeline's Pad(size=...)."""
    try:
        pipeline = cfg.data.test.pipeline
        for step in pipeline:
            if step.get("type") == "MultiScaleFlipAug":
                for inner in step["transforms"]:
                    if inner.get("type") == "Pad" and inner.get("size"):
                        return tuple(inner["size"])
            if step.get("type") == "Pad" and step.get("size"):
                return tuple(step["size"])
    except (AttributeError, KeyError):
        pass
    return (832, 1344)


DEFAULT_TEST_PIPELINE = [
    dict(type="Resize", img_scale=(1333, 800), keep_ratio=True),
    dict(type="Normalize", mean=(123.675, 116.28, 103.53),
         std=(58.395, 57.12, 57.375), to_rgb=True),
    dict(type="Pad", size_divisor=32, size=(832, 1344)),
    dict(type="Collect", keys=("img",),
         meta_keys=("ori_shape", "img_shape", "pad_shape", "scale_factor")),
]


def _prepare_image(img: Union[str, np.ndarray], pipeline) -> dict:
    if isinstance(img, str):
        try:
            import cv2
            arr = cv2.imread(img, cv2.IMREAD_COLOR)  # mmcv.imread parity
            order = "bgr"
        except ImportError:  # pragma: no cover
            from PIL import Image
            arr = np.asarray(Image.open(img).convert("RGB"))
            order = "rgb"
    else:
        arr = np.asarray(img)
        order = "bgr"  # reference contract: raw arrays are BGR (cv2-style)
    results = dict(img=arr, channel_order=order, img_shape=arr.shape[:2],
                   ori_shape=arr.shape[:2], scale_factor=1.0, flip=False)
    return pipeline(results)


def inference_detector(handle: DetectorHandle,
                       img: Union[str, np.ndarray],
                       device_preprocess: bool = False) -> List[np.ndarray]:
    """``device_preprocess=True`` runs resize+normalize+pad as ONE jitted
    XLA program on-chip (ops/preprocess.py) instead of host PIL — raw images
    are bucketed to 256-px multiples so a handful of compilations cover a
    whole dataset."""
    if device_preprocess:
        return _inference_device_preprocess(handle, img)
    cfg = handle.cfg
    steps = None
    try:
        steps = [s for s in cfg.data.test.pipeline
                 if s.get("type") not in ("LoadImageFromFile",
                                          "MultiScaleFlipAug")]
        # unwrap MultiScaleFlipAug if present
        for s in cfg.data.test.pipeline:
            if s.get("type") == "MultiScaleFlipAug":
                steps = [dict(type="Resize", img_scale=tuple(s["img_scale"]),
                              keep_ratio=True)] + \
                    [dict(t) for t in s["transforms"]
                     if t.get("type") not in ("Resize",)]
    except (AttributeError, KeyError):
        pass
    pipeline = Compose(steps or DEFAULT_TEST_PIPELINE)
    sample = _prepare_image(img, pipeline)
    predict = handle.predict_fn()
    dets, labels = predict(
        handle.params,
        jnp.asarray(sample["img"])[None],
        jnp.asarray(sample["img_shape"])[None],
        jnp.asarray(sample["scale_factor"])[None],
        jnp.asarray(sample["pad_shape"])[None])
    num_classes = handle.detector.bbox_head.num_classes
    return bbox2result(np.asarray(dets[0]), np.asarray(labels[0]), num_classes)


def _inference_device_preprocess(handle: DetectorHandle,
                                 img: Union[str, np.ndarray]) -> List[np.ndarray]:
    from ..ops.preprocess import preprocess, IMAGENET_MEAN, IMAGENET_STD

    # mirror the host pipeline's Normalize semantics exactly: images start
    # life BGR (cv2/mmcv contract) and are flipped to RGB iff to_rgb=True
    mean, std, to_rgb = IMAGENET_MEAN, IMAGENET_STD, True
    try:
        for s in handle.cfg.data.test.pipeline:
            steps = s.get("transforms", [s]) if isinstance(s, dict) else [s]
            for t in steps:
                if t.get("type") == "Normalize":
                    mean = tuple(t.get("mean", mean))
                    std = tuple(t.get("std", std))
                    to_rgb = bool(t.get("to_rgb", True))
    except (AttributeError, KeyError):
        pass
    if isinstance(img, str):
        try:
            import cv2
            arr = cv2.imread(img, cv2.IMREAD_COLOR)  # BGR
        except ImportError:  # pragma: no cover
            from PIL import Image
            arr = np.asarray(Image.open(img).convert("RGB"))[..., ::-1]
    else:
        arr = np.asarray(img)  # raw arrays are BGR (cv2-style contract)
    if to_rgb:
        arr = arr[..., ::-1]
    h, w = arr.shape[:2]
    # bucket the raw shape so compilations are reused across images
    bh = max(256, int(np.ceil(h / 256)) * 256)
    bw = max(256, int(np.ceil(w / 256)) * 256)
    raw = np.zeros((bh, bw, 3), np.uint8)
    raw[:h, :w] = arr

    canvas = _infer_canvas(handle.cfg)
    scale = (1333, 800)
    try:
        for s in handle.cfg.data.test.pipeline:
            if s.get("type") == "Resize":
                scale = tuple(s["img_scale"])
    except (AttributeError, KeyError):
        pass
    if h > w and canvas[0] < canvas[1]:
        canvas = (canvas[1], canvas[0])
    dev_img, img_shape, factor = preprocess(
        jnp.asarray(raw), jnp.asarray([h, w], jnp.int32), canvas=canvas,
        max_scale=scale, mean=mean, std=std)
    predict = handle.predict_fn()
    dets, labels = predict(
        handle.params, dev_img[None], img_shape[None],
        jnp.asarray(factor)[None], jnp.asarray([list(canvas)], jnp.int32))
    num_classes = handle.detector.bbox_head.num_classes
    return bbox2result(np.asarray(dets[0]), np.asarray(labels[0]), num_classes)


def show_result(img: Union[str, np.ndarray], result: List[np.ndarray],
                class_names, score_thr: float = 0.3,
                out_file: Optional[str] = None):
    """Draw detections (ref: show_result) using PIL."""
    from PIL import Image, ImageDraw

    if isinstance(img, str):
        im = Image.open(img).convert("RGB")
    else:
        im = Image.fromarray(np.asarray(img).astype(np.uint8))
    draw = ImageDraw.Draw(im)
    for cls_idx, dets in enumerate(result):
        for det in dets:
            if det[4] < score_thr:
                continue
            x1, y1, x2, y2 = map(float, det[:4])
            draw.rectangle([x1, y1, x2, y2], outline=(0, 255, 0), width=2)
            label = class_names[cls_idx] if class_names else str(cls_idx)
            draw.text((x1, max(0, y1 - 12)), f"{label} {det[4]:.2f}",
                      fill=(0, 255, 0))
    if out_file:
        im.save(out_file)
    return np.asarray(im)
