"""COCO run-length encoding, from scratch in numpy (capability twin of
pycocotools' C maskUtils: rleEncode/rleDecode/rleToString/rleFrString/
rleArea/rleIou — ref: mmdet results2json segm branch + LoadAnnotations.
_load_masks, which call mask_util.encode/decode).

Format notes (binary-compatible with pycocotools):
  * runs are COLUMN-major (Fortran order) and always start with the count of
    zeros (possibly 0);
  * the string form difference-codes counts from the 3rd element on and
    packs each signed int in little-endian 6-bit groups, 0x20 continuation
    bit, +48 ASCII offset.
"""

from __future__ import annotations

from typing import Dict, List, Sequence, Union

import numpy as np

RLE = Dict  # {"size": [h, w], "counts": str | list}


# ---------------------------------------------------------------------------
# core codec
# ---------------------------------------------------------------------------

def mask_to_counts(mask: np.ndarray) -> np.ndarray:
    """(h, w) {0,1} -> column-major run counts, starting with a 0-run."""
    flat = np.asfortranarray(mask.astype(np.uint8)).reshape(-1, order="F")
    if flat.size == 0:
        return np.zeros((0,), np.int64)
    change = np.nonzero(np.diff(flat))[0] + 1
    bounds = np.concatenate([[0], change, [flat.size]])
    counts = np.diff(bounds)
    if flat[0] == 1:  # must start with a zero-run
        counts = np.concatenate([[0], counts])
    return counts.astype(np.int64)


def counts_to_mask(counts: Sequence[int], h: int, w: int) -> np.ndarray:
    vals = np.zeros(len(counts), np.uint8)
    vals[1::2] = 1
    flat = np.repeat(vals, np.asarray(counts, np.int64))
    if flat.size != h * w:
        raise ValueError(f"RLE counts sum {flat.size} != {h}*{w}")
    return flat.reshape((h, w), order="F")


def counts_to_string(counts: Sequence[int]) -> str:
    """pycocotools rleToString: difference-code then 6-bit LEB pack."""
    out = []
    cnts = list(map(int, counts))
    for i, x in enumerate(cnts):
        if i > 2:
            x -= cnts[i - 2]
        more = True
        while more:
            c = x & 0x1F
            x >>= 5
            more = (x != -1) if (c & 0x10) else (x != 0)
            if more:
                c |= 0x20
            out.append(chr(c + 48))
    return "".join(out)


def string_to_counts(s: Union[str, bytes]) -> List[int]:
    if isinstance(s, bytes):
        s = s.decode("ascii")
    counts: List[int] = []
    i = 0
    while i < len(s):
        x, k = 0, 0
        more = True
        while more:
            c = ord(s[i]) - 48
            x |= (c & 0x1F) << (5 * k)
            more = bool(c & 0x20)
            i += 1
            k += 1
        if not more and (c & 0x10):
            x |= -1 << (5 * k)  # sign-extend
        if len(counts) > 2:
            x += counts[-2]
        counts.append(x)
    return counts


# ---------------------------------------------------------------------------
# public API (pycocotools-shaped)
# ---------------------------------------------------------------------------

def encode(mask: np.ndarray) -> RLE:
    """(h, w) binary mask -> compressed RLE dict."""
    h, w = mask.shape
    return dict(size=[int(h), int(w)],
                counts=counts_to_string(mask_to_counts(mask)))


def decode(rle: RLE) -> np.ndarray:
    h, w = rle["size"]
    counts = rle["counts"]
    if isinstance(counts, (str, bytes)):
        counts = string_to_counts(counts)
    return counts_to_mask(counts, int(h), int(w))


def area(rle: RLE) -> int:
    counts = rle["counts"]
    if isinstance(counts, (str, bytes)):
        counts = string_to_counts(counts)
    return int(np.sum(np.asarray(counts, np.int64)[1::2]))


def merge(rles: Sequence[RLE]) -> RLE:
    """Union of instance masks (pycocotools merge(intersect=False)) — used to
    flatten multi-part polygon segmentations."""
    if len(rles) == 1:
        return dict(rles[0])
    m = decode(rles[0]).astype(bool)
    for r in rles[1:]:
        m |= decode(r).astype(bool)
    return encode(m.astype(np.uint8))


def _counts_of(rle: RLE) -> List[int]:
    c = rle["counts"]
    return string_to_counts(c) if isinstance(c, (str, bytes)) else list(c)


def iou(dt: Sequence[RLE], gt: Sequence[RLE],
        iscrowd: Sequence[int]) -> np.ndarray:
    """(D, G) mask IoU; crowd gt -> intersection over det area (pycocotools
    rleIou semantics).  Runs on the native run-walk kernel
    (csrc/host_ops.cpp::rle_iou_matrix — same design as pycocotools' C
    rleIou: no pixel decode) with a numpy decode fallback."""
    D, G = len(dt), len(gt)
    out = np.zeros((D, G))
    if D * G == 0:
        return out
    from ...ops.host_ops import rle_iou_host
    native = rle_iou_host([_counts_of(r) for r in dt],
                          [_counts_of(r) for r in gt],
                          np.asarray(iscrowd, np.uint8))
    if native is not None:
        return native
    d_masks = [decode(r).astype(bool) for r in dt]
    g_masks = [decode(r).astype(bool) for r in gt]
    d_areas = [m.sum() for m in d_masks]
    g_areas = [m.sum() for m in g_masks]
    for i in range(D):
        for j in range(G):
            inter = np.logical_and(d_masks[i], g_masks[j]).sum()
            union = d_areas[i] if iscrowd[j] else \
                d_areas[i] + g_areas[j] - inter
            out[i, j] = inter / max(union, 1e-10)
    return out


# ---------------------------------------------------------------------------
# annotation -> RLE (gt side) and detector output -> RLE (det side)
# ---------------------------------------------------------------------------

def ann_to_rle(segm, h: int, w: int) -> RLE:
    """COCO 'segmentation' field (polygon list | uncompressed RLE dict |
    compressed RLE dict) -> compressed RLE (pycocotools annToRLE)."""
    if isinstance(segm, dict):
        counts = segm["counts"]
        if isinstance(counts, list):  # uncompressed
            return dict(size=list(segm["size"]),
                        counts=counts_to_string(counts))
        return dict(size=list(segm["size"]), counts=counts)
    # polygon(s): rasterize at full image size (PIL, like mask_target.py)
    from PIL import Image, ImageDraw
    img = Image.new("L", (int(w), int(h)), 0)
    draw = ImageDraw.Draw(img)
    for poly in segm:
        pts = np.asarray(poly, np.float64).reshape(-1, 2)
        if len(pts) >= 3:
            draw.polygon([tuple(p) for p in pts], fill=1)
    return encode(np.asarray(img, np.uint8))


def paste_mask(box_xyxy: np.ndarray, mask_prob: np.ndarray, h: int, w: int,
               thr: float = 0.5) -> np.ndarray:
    """Paste a box-frame (S, S) mask probability map into the (h, w) image
    frame (ref: FCNMaskHead.get_seg_masks' cv2.resize + threshold paste)."""
    x1, y1, x2, y2 = box_xyxy[:4]
    x1 = int(max(np.floor(x1), 0))
    y1 = int(max(np.floor(y1), 0))
    x2 = int(min(np.ceil(x2) + 1, w))
    y2 = int(min(np.ceil(y2) + 1, h))
    out = np.zeros((h, w), np.uint8)
    bw, bh = x2 - x1, y2 - y1
    if bw <= 0 or bh <= 0:
        return out
    prob = np.asarray(mask_prob, np.float32)
    try:  # cv2 == mmcv.imresize: exact reference numerics on the prob map
        import cv2
        resized = cv2.resize(prob, (bw, bh), interpolation=cv2.INTER_LINEAR)
    except ImportError:  # pragma: no cover
        from PIL import Image
        resized = np.asarray(Image.fromarray(
            (prob * 255).astype(np.uint8)).resize(
                (bw, bh), Image.BILINEAR), np.float32) / 255.0
    out[y1:y2, x1:x2] = (resized > thr).astype(np.uint8)
    return out
