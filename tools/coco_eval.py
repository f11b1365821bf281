#!/usr/bin/env python
"""Standalone COCO evaluation of a results file (ref: tools/coco_eval.py).

Usage: python tools/coco_eval.py results.pkl --ann instances_val2017.json
       python tools/coco_eval.py results.json --ann instances_val2017.json
"""

import argparse
import json
import os
import pickle
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np


def main():
    p = argparse.ArgumentParser()
    p.add_argument("results", help=".pkl (bbox2result lists) or COCO .json")
    p.add_argument("--ann", required=True, help="COCO annotation json")
    args = p.parse_args()

    from ioudet.core.evaluation import CocoEvaluator, print_coco_summary

    with open(args.ann) as f:
        coco = json.load(f)
    cat_ids = sorted(c["id"] for c in coco["categories"])
    ev = CocoEvaluator(cat_ids)
    anns_by_img = {}
    for ann in coco.get("annotations", []):
        anns_by_img.setdefault(ann["image_id"], []).append(ann)
    img_ids = [im["id"] for im in coco["images"]]
    for iid in img_ids:
        ev.add_gt(iid, anns_by_img.get(iid, []))

    if args.results.endswith(".pkl"):
        with open(args.results, "rb") as f:
            results = pickle.load(f)
        for iid, res in zip(img_ids, results):
            ev.add_det_per_class(iid, res)
    else:
        with open(args.results) as f:
            dets = json.load(f)
        cat2idx = {c: i for i, c in enumerate(cat_ids)}
        per_img = {}
        for d in dets:
            x, y, w, h = d["bbox"]
            row = [x, y, x + w - 1, y + h - 1, d["score"]]
            per_img.setdefault(d["image_id"], {}).setdefault(
                cat2idx[d["category_id"]], []).append(row)
        for iid, by_cat in per_img.items():
            res = [np.asarray(by_cat.get(c, np.zeros((0, 5))), np.float32)
                   for c in range(len(cat_ids))]
            ev.add_det_per_class(iid, res)

    print(print_coco_summary(ev.evaluate()))


if __name__ == "__main__":
    main()
