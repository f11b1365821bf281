"""From-scratch COCO-protocol bbox evaluation.

pycocotools is unavailable in this environment, so this implements the
COCOeval bbox protocol (ref capability: mmdet/core/evaluation/coco_utils.py
(coco_eval, results2json) delegating to pycocotools.cocoeval.COCOeval) in
pure numpy, faithful to the published algorithm:

  * IoU thresholds 0.50:0.05:0.95 (10), recall points 0:0.01:1 (101);
  * area ranges all / small(<32^2) / medium / large(>96^2) on gt area;
  * maxDets (1, 10, 100); crowd gts are "ignore" and matched with
    IoF-style IoU (intersection over det area);
  * greedy matching per (image, category): dets by descending score, each det
    takes the best not-yet-taken gt with IoU >= t, preferring non-ignored
    gts; unmatched dets may still match ignored/crowd gts (not counted FP);
  * -1 sentinel when a (class, area) cell has no ground truth;
  * score sorting uses mergesort (stable) like pycocotools.

IoU here follows pycocotools (NO +1): boxes enter as xywh.  The xyxy->xywh
conversion uses the reference's +1 (ref: coco_utils.py (xyxy2xywh)).
"""

from __future__ import annotations

from collections import defaultdict
from typing import Dict, List, Optional, Sequence, Tuple

import numpy as np

IOU_THRS = np.linspace(0.5, 0.95, 10)
RECALL_THRS = np.linspace(0.0, 1.0, 101)
AREA_RANGES = {
    "all": (0.0, 1e10),
    "small": (0.0, 32.0 ** 2),
    "medium": (32.0 ** 2, 96.0 ** 2),
    "large": (96.0 ** 2, 1e10),
}
MAX_DETS = (1, 10, 100)


def xyxy2xywh(bbox: np.ndarray) -> np.ndarray:
    """+1 convention, matching the reference's results2json."""
    out = bbox.copy().astype(np.float64)
    out[..., 2] = bbox[..., 2] - bbox[..., 0] + 1
    out[..., 3] = bbox[..., 3] - bbox[..., 1] + 1
    return out


def iou_xywh(dets: np.ndarray, gts: np.ndarray, iscrowd: np.ndarray) -> np.ndarray:
    """pycocotools maskUtils.iou for bbox: (D, G); crowd gt -> IoF on det."""
    D, G = dets.shape[0], gts.shape[0]
    if D * G == 0:
        return np.zeros((D, G))
    dx1, dy1 = dets[:, 0], dets[:, 1]
    dx2, dy2 = dets[:, 0] + dets[:, 2], dets[:, 1] + dets[:, 3]
    gx1, gy1 = gts[:, 0], gts[:, 1]
    gx2, gy2 = gts[:, 0] + gts[:, 2], gts[:, 1] + gts[:, 3]
    iw = np.clip(np.minimum(dx2[:, None], gx2[None, :]) -
                 np.maximum(dx1[:, None], gx1[None, :]), 0, None)
    ih = np.clip(np.minimum(dy2[:, None], gy2[None, :]) -
                 np.maximum(dy1[:, None], gy1[None, :]), 0, None)
    inter = iw * ih
    d_area = dets[:, 2] * dets[:, 3]
    g_area = gts[:, 2] * gts[:, 3]
    union = np.where(iscrowd[None, :].astype(bool), d_area[:, None],
                     d_area[:, None] + g_area[None, :] - inter)
    return inter / np.maximum(union, 1e-10)


def _evaluate_img(dets: np.ndarray, det_scores: np.ndarray,
                  gts: np.ndarray, gt_ignore: np.ndarray,
                  iscrowd: np.ndarray, area_rng: Tuple[float, float],
                  max_det: int, gt_areas: Optional[np.ndarray] = None,
                  d_rles: Optional[list] = None,
                  g_rles: Optional[list] = None):
    """Match one (image, category) cell.  Returns per-iou-threshold match
    arrays in the pycocotools layout.  With d_rles/g_rles given, matching and
    det-area gating run on masks (segm protocol) instead of boxes."""
    T = len(IOU_THRS)
    # gt ignore: explicit (crowd) OR out of area range.  pycocotools gates on
    # ann['area'] (segmentation area), which we carry via gt_areas; bbox w*h
    # is the fallback only.
    g_area = gt_areas if gt_areas is not None else gts[:, 2] * gts[:, 3]
    gIg = gt_ignore | (g_area < area_rng[0]) | (g_area > area_rng[1])
    # sort gts: non-ignored first (stable)
    gt_order = np.argsort(gIg, kind="mergesort")
    gts_s = gts[gt_order]
    gIg_s = gIg[gt_order]
    crowd_s = iscrowd[gt_order]

    det_order = np.argsort(-det_scores, kind="mergesort")[:max_det]
    dets_s = dets[det_order]
    scores_s = det_scores[det_order]

    if d_rles is not None:
        from ..mask import rle as rle_mod
        d_rles_s = [d_rles[i] for i in det_order]
        g_rles_s = [g_rles[i] for i in gt_order]
        ious = rle_mod.iou(d_rles_s, g_rles_s, crowd_s.astype(int))
        d_area_all = np.asarray([rle_mod.area(r) for r in d_rles_s],
                                np.float64)
    else:
        ious = iou_xywh(dets_s, gts_s, crowd_s)
        d_area_all = dets_s[:, 2] * dets_s[:, 3] if len(dets_s) else \
            np.zeros((0,), np.float64)
    D, G = dets_s.shape[0], gts_s.shape[0]

    # native fast path (csrc/host_ops.cpp coco_match_cpu)
    if D and G:
        from ...ops.host_ops import coco_match_host
        ndtm, ndtIg = coco_match_host(ious.astype(np.float32),
                                      gIg_s.astype(np.uint8),
                                      crowd_s.astype(np.uint8), IOU_THRS)
        if ndtm is not None:
            out_of_rng = (d_area_all < area_rng[0]) | \
                (d_area_all > area_rng[1])
            ndtIg = ndtIg | ((ndtm == 0) & out_of_rng[None, :])
            return dict(dtm=ndtm, dtIg=ndtIg, scores=scores_s,
                        num_gt=int((~gIg_s).sum()))

    dtm = np.zeros((T, D), dtype=np.int64)      # matched gt id+1 (0 = none)
    dtIg = np.zeros((T, D), dtype=bool)
    gtm = np.zeros((T, G), dtype=np.int64)

    for t, thr in enumerate(IOU_THRS):
        for d in range(D):
            best_iou = min(thr, 1 - 1e-10)
            best_g = -1
            for g in range(G):
                if gtm[t, g] > 0 and not crowd_s[g]:
                    continue  # gt already taken (crowds can match many)
                # dets go to non-ignored gts first; once we reach ignored gts
                # and already have a match, stop
                if best_g > -1 and not gIg_s[best_g] and gIg_s[g]:
                    break
                if ious[d, g] < best_iou:
                    continue
                best_iou = ious[d, g]
                best_g = g
            if best_g == -1:
                continue
            dtIg[t, d] = gIg_s[best_g]
            dtm[t, d] = best_g + 1
            gtm[t, best_g] = d + 1

    # dets out of area range & unmatched -> ignore
    out_of_rng = (d_area_all < area_rng[0]) | (d_area_all > area_rng[1])
    dtIg = dtIg | ((dtm == 0) & out_of_rng[None, :])
    return dict(dtm=dtm, dtIg=dtIg, scores=scores_s,
                num_gt=int((~gIg_s).sum()))


class CocoEvaluator:
    """Accumulates per-image results then computes the 12 COCO metrics.

    gts: per image_id -> list of dicts(bbox xywh, category_id, iscrowd, area
    optional, ignore optional).
    detections: add_image(image_id, per-class xyxy (n,5) arrays) or
    add_json_style list of dicts.
    """

    def __init__(self, cat_ids: Sequence[int], mode: str = "bbox"):
        assert mode in ("bbox", "segm"), mode
        self.cat_ids = list(cat_ids)
        self.mode = mode
        self._gts: Dict[Tuple[int, int], list] = defaultdict(list)
        self._dts: Dict[Tuple[int, int], list] = defaultdict(list)
        self.img_ids: List[int] = []

    # ------------- feeding -------------------------------------------------

    def add_gt(self, image_id: int, anns: Sequence[dict],
               img_size: Optional[Tuple[int, int]] = None):
        """img_size (h, w): required in segm mode to rasterize polygon gts."""
        if image_id not in self.img_ids:
            self.img_ids.append(image_id)
        for ann in anns:
            ig = bool(ann.get("ignore", False)) or bool(ann.get("iscrowd", 0))
            bbox = np.asarray(ann["bbox"], np.float64)
            # area-range ignore uses ann['area'] (segmentation area) exactly
            # like pycocotools; bbox w*h only as fallback
            area = float(ann.get("area", bbox[2] * bbox[3]))
            g_rle = None
            if self.mode == "segm":
                from ..mask import rle as rle_mod
                segm = ann.get("segmentation")
                if segm is None:
                    raise ValueError(
                        "segm evaluation needs 'segmentation' on every gt")
                h, w = img_size if img_size is not None else ann["size"]
                g_rle = rle_mod.ann_to_rle(segm, h, w)
            self._gts[(image_id, ann["category_id"])].append(
                (bbox, ig, bool(ann.get("iscrowd", 0)), area, g_rle))

    def add_det_per_class(self, image_id: int, result: Sequence[np.ndarray],
                          segms: Optional[Sequence[list]] = None):
        """result: per-class list of (n, 5) xyxy+score (the bbox2result
        format); class index i -> self.cat_ids[i].  segms: per-class lists
        of RLE dicts aligned with result rows (segm mode)."""
        if len(result) > len(self.cat_ids):
            raise ValueError(
                f"model predicts {len(result)} foreground classes but the "
                f"dataset has {len(self.cat_ids)} categories — check the "
                f"config's num_classes against the annotation file")
        if self.mode == "segm" and segms is None:
            raise ValueError("segm evaluation needs per-det RLE masks")
        if image_id not in self.img_ids:
            self.img_ids.append(image_id)
        for ci, dets in enumerate(result):
            if len(dets) == 0:
                continue
            xywh = xyxy2xywh(dets[:, :4])
            for di, (row, score) in enumerate(zip(xywh, dets[:, 4])):
                d_rle = segms[ci][di] if segms is not None else None
                self._dts[(image_id, self.cat_ids[ci])].append(
                    (row, float(score), d_rle))

    # ------------- evaluation ----------------------------------------------

    def evaluate(self) -> Dict[str, float]:
        T, R = len(IOU_THRS), len(RECALL_THRS)
        K = len(self.cat_ids)
        A = len(AREA_RANGES)
        M = len(MAX_DETS)
        precision = -np.ones((T, R, K, A, M))
        recall = -np.ones((T, K, A, M))

        area_items = list(AREA_RANGES.items())
        for k, cat in enumerate(self.cat_ids):
            for a, (_, rng) in enumerate(area_items):
                for m, max_det in enumerate(MAX_DETS):
                    evals = []
                    for img in self.img_ids:
                        gt = self._gts.get((img, cat), [])
                        dt = self._dts.get((img, cat), [])
                        if not gt and not dt:
                            continue
                        gts = np.array([g[0] for g in gt]).reshape(-1, 4)
                        gIg = np.array([g[1] for g in gt], bool)
                        crowd = np.array([g[2] for g in gt], bool)
                        # back-compat: round-1 tuples had no area slot
                        g_areas = np.array(
                            [g[3] if len(g) > 3 else g[0][2] * g[0][3]
                             for g in gt], np.float64)
                        d_rles = g_rles = None
                        if self.mode == "segm":
                            d_rles = [d[2] for d in dt]
                            g_rles = [g[4] for g in gt]
                        dets = np.array([d[0] for d in dt]).reshape(-1, 4)
                        scores = np.array([d[1] for d in dt], np.float64)
                        evals.append(_evaluate_img(dets, scores, gts, gIg,
                                                   crowd, rng, max_det,
                                                   gt_areas=g_areas,
                                                   d_rles=d_rles,
                                                   g_rles=g_rles))
                    if not evals:
                        continue
                    dtm = np.concatenate([e["dtm"] for e in evals], axis=1)
                    dtIg = np.concatenate([e["dtIg"] for e in evals], axis=1)
                    scores = np.concatenate([e["scores"] for e in evals])
                    npig = sum(e["num_gt"] for e in evals)
                    if npig == 0:
                        continue
                    order = np.argsort(-scores, kind="mergesort")
                    dtm, dtIg = dtm[:, order], dtIg[:, order]
                    tps = (dtm > 0) & ~dtIg
                    fps = (dtm == 0) & ~dtIg
                    tp_sum = np.cumsum(tps, axis=1).astype(np.float64)
                    fp_sum = np.cumsum(fps, axis=1).astype(np.float64)
                    for t in range(T):
                        tp, fp = tp_sum[t], fp_sum[t]
                        nd = len(tp)
                        rc = tp / npig
                        pr = tp / np.maximum(tp + fp, np.finfo(np.float64).eps)
                        recall[t, k, a, m] = rc[-1] if nd else 0
                        # precision envelope (monotone decreasing)
                        q = np.zeros(R)
                        pr = pr.tolist()
                        for i in range(nd - 1, 0, -1):
                            if pr[i] > pr[i - 1]:
                                pr[i - 1] = pr[i]
                        inds = np.searchsorted(rc, RECALL_THRS, side="left")
                        for ri, pi in enumerate(inds):
                            if pi < nd:
                                q[ri] = pr[pi]
                        precision[t, :, k, a, m] = q

        def _summarize(ap=True, iou=None, area="all", max_det=100):
            a = list(AREA_RANGES).index(area)
            m = MAX_DETS.index(max_det)
            if ap:
                s = precision[:, :, :, a, m] if iou is None else \
                    precision[[np.where(np.isclose(IOU_THRS, iou))[0][0]], :, :, a, m]
            else:
                s = recall[:, :, a, m] if iou is None else \
                    recall[[np.where(np.isclose(IOU_THRS, iou))[0][0]], :, a, m]
            valid = s[s > -1]
            return float(np.mean(valid)) if valid.size else -1.0

        self.precision = precision
        self.recall = recall
        return {
            "AP": _summarize(True),
            "AP50": _summarize(True, iou=0.5),
            "AP75": _summarize(True, iou=0.75),
            "APs": _summarize(True, area="small"),
            "APm": _summarize(True, area="medium"),
            "APl": _summarize(True, area="large"),
            "AR1": _summarize(False, max_det=1),
            "AR10": _summarize(False, max_det=10),
            "AR100": _summarize(False),
            "ARs": _summarize(False, area="small"),
            "ARm": _summarize(False, area="medium"),
            "ARl": _summarize(False, area="large"),
        }


def coco_eval_results(results_per_image: Sequence[Sequence[np.ndarray]],
                      gts_per_image: Sequence[Sequence[dict]],
                      image_ids: Sequence[int],
                      cat_ids: Sequence[int]) -> Dict[str, float]:
    """Convenience wrapper: bbox2result-format detections + gt dicts -> metrics."""
    ev = CocoEvaluator(cat_ids)
    for img_id, gt in zip(image_ids, gts_per_image):
        ev.add_gt(img_id, gt)
    for img_id, res in zip(image_ids, results_per_image):
        ev.add_det_per_class(img_id, res)
    return ev.evaluate()


def print_coco_summary(metrics: Dict[str, float]) -> str:
    lines = [
        f" Average Precision  (AP) @[ IoU=0.50:0.95 | area=   all | maxDets=100 ] = {metrics['AP']:.3f}",
        f" Average Precision  (AP) @[ IoU=0.50      | area=   all | maxDets=100 ] = {metrics['AP50']:.3f}",
        f" Average Precision  (AP) @[ IoU=0.75      | area=   all | maxDets=100 ] = {metrics['AP75']:.3f}",
        f" Average Precision  (AP) @[ IoU=0.50:0.95 | area= small | maxDets=100 ] = {metrics['APs']:.3f}",
        f" Average Precision  (AP) @[ IoU=0.50:0.95 | area=medium | maxDets=100 ] = {metrics['APm']:.3f}",
        f" Average Precision  (AP) @[ IoU=0.50:0.95 | area= large | maxDets=100 ] = {metrics['APl']:.3f}",
        f" Average Recall     (AR) @[ IoU=0.50:0.95 | area=   all | maxDets=  1 ] = {metrics['AR1']:.3f}",
        f" Average Recall     (AR) @[ IoU=0.50:0.95 | area=   all | maxDets= 10 ] = {metrics['AR10']:.3f}",
        f" Average Recall     (AR) @[ IoU=0.50:0.95 | area=   all | maxDets=100 ] = {metrics['AR100']:.3f}",
        f" Average Recall     (AR) @[ IoU=0.50:0.95 | area= small | maxDets=100 ] = {metrics['ARs']:.3f}",
        f" Average Recall     (AR) @[ IoU=0.50:0.95 | area=medium | maxDets=100 ] = {metrics['ARm']:.3f}",
        f" Average Recall     (AR) @[ IoU=0.50:0.95 | area= large | maxDets=100 ] = {metrics['ARl']:.3f}",
    ]
    return "\n".join(lines)
