"""ctypes bindings for the native host-ops library (csrc/host_ops.cpp).

Replaces the reference's compiled CPU kernels (ref: mmdet/ops/nms/src/
nms_cpu.cpp, soft_nms_cpu.pyx and pycocotools' C evaluateImg loop) for the
host-side evaluation pipeline.  Falls back to numpy implementations when the
library hasn't been built (``make -C csrc``); ``build_native()`` compiles it
on demand with g++.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
from typing import Optional, Tuple

import numpy as np

_LIB_PATH = os.path.join(os.path.dirname(__file__), "..", "_native",
                         "libhostops.so")
_lib: Optional[ctypes.CDLL] = None


def build_native() -> bool:
    """Compile csrc/host_ops.cpp with g++.  Returns success."""
    csrc = os.path.join(os.path.dirname(__file__), "..", "..", "csrc")
    try:
        subprocess.run(["make", "-C", csrc], check=True,
                       capture_output=True, text=True)
        return True
    except (subprocess.CalledProcessError, FileNotFoundError):
        return False


def _load() -> Optional[ctypes.CDLL]:
    global _lib
    if _lib is not None:
        return _lib
    if not os.path.exists(_LIB_PATH):
        if not build_native():
            return None
    try:
        lib = ctypes.CDLL(os.path.abspath(_LIB_PATH))
    except OSError:
        return None
    f32p = np.ctypeslib.ndpointer(np.float32, flags="C_CONTIGUOUS")
    f64p = np.ctypeslib.ndpointer(np.float64, flags="C_CONTIGUOUS")
    u8p = np.ctypeslib.ndpointer(np.uint8, flags="C_CONTIGUOUS")
    i32p = np.ctypeslib.ndpointer(np.int32, flags="C_CONTIGUOUS")
    i64p = np.ctypeslib.ndpointer(np.int64, flags="C_CONTIGUOUS")
    lib.nms_cpu.argtypes = [f32p, f32p, ctypes.c_int, ctypes.c_float,
                            ctypes.c_int, u8p]
    lib.nms_cpu.restype = ctypes.c_int
    lib.soft_nms_cpu.argtypes = [f32p, f32p, ctypes.c_int, ctypes.c_float,
                                 ctypes.c_float, ctypes.c_float, ctypes.c_int,
                                 ctypes.c_int, i32p]
    lib.soft_nms_cpu.restype = ctypes.c_int
    lib.bbox_overlaps_cpu.argtypes = [f32p, ctypes.c_int, f32p, ctypes.c_int,
                                      ctypes.c_int, ctypes.c_int, f32p]
    lib.bbox_overlaps_cpu.restype = None
    lib.coco_match_cpu.argtypes = [f32p, ctypes.c_int, ctypes.c_int, u8p, u8p,
                                   f64p, ctypes.c_int, i64p, u8p]
    lib.coco_match_cpu.restype = None
    try:  # added after round 1 — absent in stale prebuilt .so
        lib.rle_iou_matrix.argtypes = [i64p, i64p, ctypes.c_int,
                                       i64p, i64p, ctypes.c_int,
                                       i64p, i64p, u8p, f64p]
        lib.rle_iou_matrix.restype = None
    except AttributeError:
        pass
    _lib = lib
    return lib


def native_available() -> bool:
    return _load() is not None


def nms_host(boxes: np.ndarray, scores: np.ndarray, iou_thr: float,
             plus_one: bool = True) -> np.ndarray:
    """Greedy NMS on host; returns kept indices sorted by score desc."""
    boxes = np.ascontiguousarray(boxes[:, :4], np.float32)
    scores = np.ascontiguousarray(scores, np.float32)
    n = boxes.shape[0]
    lib = _load()
    if lib is not None and n:
        keep = np.zeros(n, np.uint8)
        lib.nms_cpu(boxes, scores, n, float(iou_thr), int(plus_one), keep)
        idx = np.where(keep)[0]
        return idx[np.argsort(-scores[idx], kind="stable")]
    # numpy fallback
    order = np.argsort(-scores, kind="stable")
    suppressed = np.zeros(n, bool)
    keep_list = []
    off = 1.0 if plus_one else 0.0
    for oi, i in enumerate(order):
        if suppressed[i]:
            continue
        keep_list.append(i)
        rest = order[oi + 1:]
        rest = rest[~suppressed[rest]]
        if rest.size == 0:
            continue
        iw = np.minimum(boxes[i, 2], boxes[rest, 2]) - \
            np.maximum(boxes[i, 0], boxes[rest, 0]) + off
        ih = np.minimum(boxes[i, 3], boxes[rest, 3]) - \
            np.maximum(boxes[i, 1], boxes[rest, 1]) + off
        inter = np.clip(iw, 0, None) * np.clip(ih, 0, None)
        a_i = (boxes[i, 2] - boxes[i, 0] + off) * (boxes[i, 3] - boxes[i, 1] + off)
        a_r = (boxes[rest, 2] - boxes[rest, 0] + off) * \
            (boxes[rest, 3] - boxes[rest, 1] + off)
        suppressed[rest[inter / (a_i + a_r - inter) > iou_thr]] = True
    return np.asarray(keep_list, np.int64)


def soft_nms_host(boxes: np.ndarray, scores: np.ndarray, iou_thr: float = 0.3,
                  sigma: float = 0.5, min_score: float = 1e-3,
                  method: str = "linear",
                  plus_one: bool = True) -> Tuple[np.ndarray, np.ndarray]:
    """Returns (selected indices, decayed scores in selection order)."""
    methods = {"linear": 0, "gaussian": 1, "naive": 2}
    boxes = np.ascontiguousarray(boxes[:, :4], np.float32)
    work = np.ascontiguousarray(scores, np.float32).copy()
    n = boxes.shape[0]
    lib = _load()
    if lib is not None and n:
        order = np.full(n, -1, np.int32)
        cnt = lib.soft_nms_cpu(boxes, work, n, float(iou_thr), float(sigma),
                               float(min_score), methods[method],
                               int(plus_one), order)
        sel = order[:cnt].astype(np.int64)
        return sel, work[sel]
    # numpy fallback mirrors the device soft_nms semantics
    alive = list(range(n))
    sel, out_scores = [], []
    off = 1.0 if plus_one else 0.0
    while alive:
        k = int(np.argmax(work[alive]))
        i = alive[k]
        if work[i] <= min_score:
            break
        sel.append(i)
        out_scores.append(work[i])
        alive.pop(k)
        if not alive:
            break
        rest = np.asarray(alive)
        iw = np.minimum(boxes[i, 2], boxes[rest, 2]) - \
            np.maximum(boxes[i, 0], boxes[rest, 0]) + off
        ih = np.minimum(boxes[i, 3], boxes[rest, 3]) - \
            np.maximum(boxes[i, 1], boxes[rest, 1]) + off
        inter = np.clip(iw, 0, None) * np.clip(ih, 0, None)
        a_i = (boxes[i, 2] - boxes[i, 0] + off) * (boxes[i, 3] - boxes[i, 1] + off)
        a_r = (boxes[rest, 2] - boxes[rest, 0] + off) * \
            (boxes[rest, 3] - boxes[rest, 1] + off)
        ov = inter / (a_i + a_r - inter)
        if method == "linear":
            w = np.where(ov > iou_thr, 1 - ov, 1.0)
        elif method == "gaussian":
            w = np.exp(-(ov * ov) / sigma)
        else:
            w = np.where(ov > iou_thr, 0.0, 1.0)
        work[rest] *= w
    return np.asarray(sel, np.int64), np.asarray(out_scores, np.float32)


def bbox_overlaps_host(b1: np.ndarray, b2: np.ndarray, mode: str = "iou",
                       plus_one: bool = True) -> np.ndarray:
    lib = _load()
    n, m = b1.shape[0], b2.shape[0]
    if lib is not None and n * m:
        out = np.zeros((n, m), np.float32)
        lib.bbox_overlaps_cpu(np.ascontiguousarray(b1[:, :4], np.float32), n,
                              np.ascontiguousarray(b2[:, :4], np.float32), m,
                              0 if mode == "iou" else 1, int(plus_one), out)
        return out
    from ..core.evaluation.bbox_overlaps import bbox_overlaps_np
    return bbox_overlaps_np(b1, b2, mode).astype(np.float32)


def coco_match_host(ious: np.ndarray, gt_ignore: np.ndarray,
                    iscrowd: np.ndarray,
                    thrs: np.ndarray) -> Tuple[np.ndarray, np.ndarray]:
    """Native COCO det<->gt matching; returns (dtm (T, D), dt_ignore (T, D))."""
    D, G = ious.shape
    T = len(thrs)
    lib = _load()
    dtm = np.zeros((T, D), np.int64)
    dtIg = np.zeros((T, D), np.uint8)
    if lib is not None and D and G:
        lib.coco_match_cpu(np.ascontiguousarray(ious, np.float32), D, G,
                           np.ascontiguousarray(gt_ignore, np.uint8),
                           np.ascontiguousarray(iscrowd, np.uint8),
                           np.ascontiguousarray(thrs, np.float64), T,
                           dtm, dtIg)
        return dtm, dtIg.astype(bool)
    return None, None  # caller falls back to python loop


def rle_iou_host(d_counts_list, g_counts_list,
                 iscrowd: np.ndarray) -> Optional[np.ndarray]:
    """(D, G) mask IoU straight from run-length counts — no pixel decode
    (native twin of pycocotools rleIou; ref: maskUtils.iou).  Returns None
    when the native lib is unavailable (caller decodes and falls back)."""
    lib = _load()
    if lib is None or not hasattr(lib, "rle_iou_matrix"):
        return None
    D, G = len(d_counts_list), len(g_counts_list)
    out = np.zeros((D, G), np.float64)
    if D == 0 or G == 0:
        return out

    def pack(lists):
        offs = np.zeros(len(lists) + 1, np.int64)
        for i, c in enumerate(lists):
            offs[i + 1] = offs[i] + len(c)
        flat = (np.concatenate([np.asarray(c, np.int64) for c in lists])
                if offs[-1] else np.zeros((1,), np.int64))
        areas = np.asarray([int(np.sum(np.asarray(c, np.int64)[1::2]))
                            for c in lists], np.int64)
        return np.ascontiguousarray(flat), offs, areas

    dflat, doffs, dareas = pack(d_counts_list)
    gflat, goffs, gareas = pack(g_counts_list)
    lib.rle_iou_matrix(dflat, doffs, D, gflat, goffs, G, dareas, gareas,
                       np.ascontiguousarray(iscrowd, np.uint8), out)
    return out
