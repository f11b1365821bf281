#!/usr/bin/env python
"""Single-image inference demo (ref: demo/ notebook).

Usage: python demo/inference_demo.py IMAGE [--config CFG] [--checkpoint CKPT]
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main():
    p = argparse.ArgumentParser()
    p.add_argument("image")
    p.add_argument("--config",
                   default=os.path.join(os.path.dirname(__file__), "..",
                                        "configs",
                                        "iou_aware_retinanet_r50_fpn_1x.py"))
    p.add_argument("--checkpoint", default=None)
    p.add_argument("--out", default="demo_out.jpg")
    p.add_argument("--score-thr", type=float, default=0.3)
    args = p.parse_args()

    from ioudet.apis import init_detector, inference_detector, show_result
    from ioudet.core.evaluation import coco_classes

    handle = init_detector(args.config, args.checkpoint)
    result = inference_detector(handle, args.image)
    classes = handle.CLASSES or coco_classes()
    show_result(args.image, result, classes, score_thr=args.score_thr,
                out_file=args.out)
    n = sum(int((d[:, 4] > args.score_thr).sum()) for d in result)
    print(f"{n} detections above {args.score_thr}; wrote {args.out}")


if __name__ == "__main__":
    main()
