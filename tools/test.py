#!/usr/bin/env python
"""Evaluation CLI (ref: tools/test.py).

Usage: python tools/test.py CONFIG CHECKPOINT --eval bbox [--out out.pkl]
       [--json_out results.json]
"""

import argparse
import json
import os
import pickle
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def parse_args():
    p = argparse.ArgumentParser(description="Test a detector")
    p.add_argument("config")
    p.add_argument("checkpoint", nargs="?", default=None)
    p.add_argument("--out", default=None, help="pickle output of raw results")
    p.add_argument("--json_out", default=None, help="COCO-json output")
    p.add_argument("--eval", nargs="*", default=[],
                   help="metrics: bbox (COCO) / mAP (VOC)")
    p.add_argument("--batch", type=int, default=8)
    p.add_argument("--device-preprocess", action="store_true",
                   help="decode-only host loop; fused on-chip resize/normalize/pad")
    p.add_argument("--show", action="store_true",
                   help="write annotated result images (ref: tools/test.py "
                        "--show; headless here, so files instead of windows)")
    p.add_argument("--show-dir", default=None,
                   help="directory for --show output "
                        "(default: <work area>/show)")
    p.add_argument("--show-score-thr", type=float, default=0.3)
    return p.parse_args()


def main():
    args = parse_args()
    from ioudet import Config
    from ioudet.apis import init_detector, single_device_test
    from ioudet.data import build_dataset

    cfg = Config.fromfile(args.config)
    handle = init_detector(cfg, args.checkpoint)
    dataset = build_dataset(cfg.data["test"])
    has_tta = any(s.get("type") == "MultiScaleFlipAug"
                  for s in cfg.data["test"]["pipeline"])
    if has_tta:
        from ioudet.apis.test import tta_test
        results = tta_test(handle.detector, handle.params, dataset,
                           cfg.get("test_cfg", {}))
    else:
        results = single_device_test(handle.detector, handle.params, dataset,
                                     imgs_per_batch=args.batch,
                                     device_preprocess=args.device_preprocess)
    if args.show or args.show_dir:
        from ioudet.apis.inference import show_result
        show_dir = args.show_dir or "show"
        os.makedirs(show_dir, exist_ok=True)
        classes = getattr(dataset, "CLASSES", None)
        for i in range(len(dataset)):
            info = dataset.img_infos[i]
            src = os.path.join(dataset.img_prefix, info["filename"])
            res = results[i][0] if isinstance(results[i], tuple) \
                else results[i]
            out_file = os.path.join(
                show_dir, os.path.basename(info["filename"]))
            show_result(src, res, classes, score_thr=args.show_score_thr,
                        out_file=out_file)
        print(f"wrote {len(dataset)} annotated images to {show_dir}")
    if args.out:
        with open(args.out, "wb") as f:
            pickle.dump(results, f)
    if args.json_out and hasattr(dataset, "results2json"):
        with open(args.json_out, "w") as f:
            json.dump(dataset.results2json(results), f)
    for metric in args.eval:
        if metric in ("bbox", "segm", "mAP") and hasattr(dataset, "evaluate"):
            print(dataset.evaluate(results,
                                   **({} if metric == "mAP"
                                      else dict(metric=metric))))


if __name__ == "__main__":
    main()
