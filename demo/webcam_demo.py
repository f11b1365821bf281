#!/usr/bin/env python
"""Webcam / video-stream inference demo (ref: demo/webcam_demo.py).

Reads frames from a camera index or a video file, runs the detector on each
frame, and displays (or writes) the annotated stream.  The detector's
fixed-canvas jitted program compiles once on the first frame; subsequent
frames reuse it, so steady-state latency is one inference per frame.

Usage:
  python demo/webcam_demo.py --config CFG --checkpoint CKPT \
      [--camera-id 0 | --input video.mp4] [--out annotated.mp4] \
      [--score-thr 0.3]
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--config",
                   default=os.path.join(os.path.dirname(__file__), "..",
                                        "configs",
                                        "iou_aware_retinanet_r50_fpn_1x.py"))
    p.add_argument("--checkpoint", default=None)
    p.add_argument("--camera-id", type=int, default=0)
    p.add_argument("--input", default=None,
                   help="video file instead of a camera")
    p.add_argument("--out", default=None,
                   help="write annotated frames to this video file "
                        "(headless mode; no display window)")
    p.add_argument("--score-thr", type=float, default=0.3)
    p.add_argument("--max-frames", type=int, default=0,
                   help="stop after N frames (0 = unbounded)")
    args = p.parse_args()

    try:
        import cv2
    except ImportError:
        sys.exit("webcam_demo requires opencv-python (cv2)")

    from ioudet.apis import init_detector, inference_detector, show_result
    from ioudet.core.evaluation import coco_classes

    handle = init_detector(args.config, args.checkpoint)
    classes = handle.CLASSES or coco_classes()

    cap = cv2.VideoCapture(args.input if args.input else args.camera_id)
    if not cap.isOpened():
        sys.exit("could not open video source")
    writer = None
    n = 0
    while True:
        ok, frame = cap.read()
        if not ok:
            break
        result = inference_detector(handle, frame)  # BGR in, like the ref
        # show_result draws via PIL (RGB); flip for display/writing as BGR
        vis = show_result(frame[:, :, ::-1], result, classes,
                          score_thr=args.score_thr)[:, :, ::-1]
        if args.out:
            if writer is None:
                fourcc = cv2.VideoWriter_fourcc(*"mp4v")
                fps = cap.get(cv2.CAP_PROP_FPS) or 25.0
                writer = cv2.VideoWriter(args.out, fourcc, fps,
                                         (vis.shape[1], vis.shape[0]))
            writer.write(vis)
        else:
            cv2.imshow("ioudet", vis)
            if cv2.waitKey(1) == 27:  # ESC
                break
        n += 1
        if args.max_frames and n >= args.max_frames:
            break
    cap.release()
    if writer is not None:
        writer.release()
    print(f"processed {n} frames")


if __name__ == "__main__":
    main()
