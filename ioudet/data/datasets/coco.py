"""COCO dataset (ref: mmdet/datasets/coco.py (CocoDataset)).

pycocotools is unavailable here, so the COCO json is parsed directly (it is
plain JSON; the C extension only accelerates mask ops, which boxes-only
detection never touches).  Semantics preserved:
  * cat2label is 1-based (0 = background);
  * crowd annotations go to ``bboxes_ignore``;
  * xywh -> xyxy with the v1 +1 convention (x2 = x + w - 1);
  * images without annotations are filtered in train mode.
"""

from __future__ import annotations

import json
from collections import defaultdict
from typing import List

import numpy as np

from ...core.evaluation.class_names import COCO_CLASSES
from ..registry import DATASETS
from .custom import CustomDataset


@DATASETS.register_module
class CocoDataset(CustomDataset):
    CLASSES = COCO_CLASSES

    def load_annotations(self, ann_file: str) -> List[dict]:
        with open(ann_file) as f:
            coco = json.load(f)
        self.cat_ids = [c["id"] for c in sorted(coco["categories"],
                                                key=lambda c: c["id"])]
        self.cat2label = {cid: i + 1 for i, cid in enumerate(self.cat_ids)}
        anns_by_img = defaultdict(list)
        for ann in coco.get("annotations", []):
            anns_by_img[ann["image_id"]].append(ann)
        self._anns_by_img = anns_by_img
        img_infos = []
        for img in coco["images"]:
            img_infos.append(dict(
                id=img["id"], filename=img["file_name"],
                width=img["width"], height=img["height"]))
        return img_infos

    def get_ann_info(self, idx: int) -> dict:
        info = self.img_infos[idx]
        anns = self._anns_by_img.get(info["id"], [])
        bboxes, labels, ignore, masks = [], [], [], []
        for ann in anns:
            if ann.get("ignore", False):
                continue
            x, y, w, h = ann["bbox"]
            # clip to image, drop degenerate (ref: _parse_ann_info)
            x1 = max(x, 0)
            y1 = max(y, 0)
            ww = min(x + w, info["width"]) - x1
            hh = min(y + h, info["height"]) - y1
            if ww <= 0 or hh <= 0 or ann.get("area", ww * hh) <= 0:
                continue
            box = [x1, y1, x1 + ww - 1, y1 + hh - 1]
            if ann.get("iscrowd", 0):
                ignore.append(box)
            else:
                bboxes.append(box)
                labels.append(self.cat2label[ann["category_id"]])
                seg = ann.get("segmentation")
                # polygon lists only (RLE crowd segs land in ignore above)
                masks.append(seg if isinstance(seg, list) else [])
        return dict(
            bboxes=np.asarray(bboxes, np.float32).reshape(-1, 4),
            labels=np.asarray(labels, np.int64),
            bboxes_ignore=np.asarray(ignore, np.float32).reshape(-1, 4),
            masks=masks)

    def _filter_imgs(self, min_size: int = 32) -> List[int]:
        valid = []
        for i, info in enumerate(self.img_infos):
            if min(info["width"], info["height"]) < min_size:
                continue
            if self.filter_empty_gt and not self._anns_by_img.get(info["id"]):
                continue
            valid.append(i)
        return valid

    # ---- evaluation --------------------------------------------------------

    def gt_for_eval(self, idx: int, with_segm: bool = False) -> List[dict]:
        """COCO-protocol gt dicts (xywh, no +1 — pycocotools convention)."""
        info = self.img_infos[idx]
        out = []
        for ann in self._anns_by_img.get(info["id"], []):
            w, h = float(ann["bbox"][2]), float(ann["bbox"][3])
            d = dict(bbox=list(map(float, ann["bbox"])),
                     category_id=ann["category_id"],
                     iscrowd=ann.get("iscrowd", 0),
                     ignore=ann.get("ignore", False),
                     # pycocotools gates area ranges on the
                     # SEGMENTATION area field, not bbox w*h
                     area=float(ann.get("area", w * h)))
            if with_segm:
                d["segmentation"] = ann.get("segmentation")
            out.append(d)
        return out

    def evaluate(self, results, metric="bbox", logger=None):
        """results: list (len == len(self)) of bbox2result per-class lists,
        or (bbox_results, segm_results) tuples from mask detectors.
        metric: 'bbox' | 'segm' | list of both (ref: coco_utils.coco_eval)."""
        from ...core.evaluation import CocoEvaluator, print_coco_summary
        metrics_req = [metric] if isinstance(metric, str) else list(metric)
        all_metrics = {}
        log = logger.info if logger else print
        for m in metrics_req:
            assert m in ("bbox", "segm"), m
            ev = CocoEvaluator(self.cat_ids, mode=m)
            for idx in range(len(self)):
                info = self.img_infos[idx]
                ev.add_gt(info["id"], self.gt_for_eval(idx,
                                                       with_segm=m == "segm"),
                          img_size=(info["height"], info["width"]))
                res = results[idx]
                if isinstance(res, tuple):
                    bbox_res, segm_res = res
                else:
                    bbox_res, segm_res = res, None
                if m == "segm":
                    if segm_res is None:
                        raise ValueError(
                            "segm metric requested but results carry no "
                            "masks — is the model a mask detector?")
                    ev.add_det_per_class(info["id"], bbox_res, segms=segm_res)
                else:
                    ev.add_det_per_class(info["id"], bbox_res)
            mm = ev.evaluate()
            log(f"--- {m} ---")
            log(print_coco_summary(mm))
            if len(metrics_req) == 1:
                all_metrics.update(mm)
            else:
                all_metrics.update({f"{m}_{k}": v for k, v in mm.items()})
        return all_metrics

    def results2json(self, results) -> List[dict]:
        """ref: mmdet/core/evaluation/coco_utils.py (results2json) — bbox
        records, plus segmentation RLEs when results carry masks."""
        from ...core.evaluation.coco_eval import xyxy2xywh
        out = []
        for idx, res in enumerate(results):
            img_id = self.img_infos[idx]["id"]
            per_cls, segms = (res if isinstance(res, tuple) else (res, None))
            for ci, dets in enumerate(per_cls):
                for di, det in enumerate(dets):
                    rec = dict(
                        image_id=img_id,
                        bbox=[float(v) for v in xyxy2xywh(det[None, :4])[0]],
                        score=float(det[4]),
                        category_id=self.cat_ids[ci])
                    if segms is not None:
                        rec["segmentation"] = segms[ci][di]
                    out.append(rec)
        return out
