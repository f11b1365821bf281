#!/usr/bin/env python
"""Standalone VOC mAP evaluation of a results pickle (ref: tools/voc_eval.py)."""

import argparse
import os
import pickle
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main():
    p = argparse.ArgumentParser()
    p.add_argument("results", help=".pkl of bbox2result lists")
    p.add_argument("config", help="dataset config (for annotations)")
    p.add_argument("--iou-thr", type=float, default=0.5)
    args = p.parse_args()

    from ioudet import Config
    from ioudet.data import build_dataset
    from ioudet.core.evaluation import eval_map, print_map_summary

    cfg = Config.fromfile(args.config)
    dataset = build_dataset(cfg.data["test"])
    with open(args.results, "rb") as f:
        results = pickle.load(f)
    gts = [dataset.get_ann_info(i) for i in range(len(dataset))]
    mean_ap, per_cls = eval_map(
        results, [g["bboxes"] for g in gts], [g["labels"] for g in gts],
        iou_thr=args.iou_thr, num_classes=len(dataset.CLASSES),
        mode="11points" if getattr(dataset, "year", 2012) == 2007 else "area")
    print(print_map_summary(mean_ap, per_cls))


if __name__ == "__main__":
    main()
