#!/usr/bin/env python
"""Host input-pipeline feed-rate bench (VERDICT r4 next #4 / SURVEY §7 hard
part 4).

At the chip's measured ~195 img/s the host must decode + resize + normalize
+ pad ~195 JPEGs/s or the loader, not conv MFU, is the production ceiling.
This measures the REAL pipeline (LoadImageFromFile -> Resize(1333,800) ->
RandomFlip -> Normalize -> Pad to the 832x1344 canvas) over a synthetic
JPEG corpus at COCO-typical sizes, sweeping worker counts, plus two
ablations:
  * decode-only (LoadImageFromFile alone) — splits JPEG IDCT cost from the
    numpy resize/normalize tail;
  * the --device-preprocess feed (decode + pad-raw only; resize/normalize/
    pad run fused on-chip via ops/preprocess.py) — the host-offload answer
    if the full pipeline can't keep up.

Prints one JSON line per configuration with img/s and img/s/core (this
sandbox host has 1 core; production feed requirement = chip_rate /
img_per_sec_per_core cores).  Results recorded in docs/MODEL_ZOO.md.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                ".."))

import numpy as np


def make_corpus(root, n=48, seed=0):
    """COCO-typical JPEGs (640x480-ish, quality 90) + a matching ann json."""
    from PIL import Image
    rng = np.random.default_rng(seed)
    img_dir = os.path.join(root, "imgs")
    os.makedirs(img_dir, exist_ok=True)
    images, annotations = [], []
    sizes = [(640, 480), (640, 427), (500, 375), (612, 612)]
    for i in range(n):
        w, h = sizes[i % len(sizes)]
        # low-frequency content -> realistic JPEG entropy (pure noise
        # decodes unrealistically slowly, flat color unrealistically fast)
        small = rng.integers(0, 255, (h // 8, w // 8, 3), np.uint8)
        arr = np.asarray(Image.fromarray(small).resize((w, h),
                                                       Image.BILINEAR))
        noise = rng.integers(0, 16, arr.shape, np.uint8)
        Image.fromarray(arr + noise).save(
            os.path.join(img_dir, f"{i}.jpg"), quality=90)
        images.append(dict(id=i, file_name=f"{i}.jpg", width=w, height=h))
        annotations.append(dict(id=i, image_id=i, category_id=1,
                                bbox=[10, 10, 50, 50], area=2500, iscrowd=0))
    ann = os.path.join(root, "ann.json")
    with open(ann, "w") as f:
        json.dump(dict(images=images, annotations=annotations,
                       categories=[dict(id=1, name="thing")]), f)
    return ann, img_dir


def drain(dataset, batch, workers, seconds=12.0):
    from ioudet.data import build_dataloader
    loader = build_dataloader(dataset, batch, workers, shuffle=False,
                              drop_last=False)
    n, t0 = 0, time.perf_counter()
    epoch = 0
    while time.perf_counter() - t0 < seconds:
        loader.set_epoch(epoch)
        for b in loader:
            n += int(b["img"].shape[0])
            if time.perf_counter() - t0 >= seconds:
                break
        epoch += 1
    dt = time.perf_counter() - t0
    return n / dt


def main():
    import tempfile

    from ioudet.data import build_dataset

    cores = os.cpu_count() or 1
    chip_rate = float(os.environ.get("CHIP_RATE", 195.0))
    root = tempfile.mkdtemp(prefix="loaderbench_")
    ann, img_dir = make_corpus(root)

    norm = dict(mean=(123.675, 116.28, 103.53), std=(58.395, 57.12, 57.375),
                to_rgb=True)
    full_pipe = [
        dict(type="LoadImageFromFile"),
        dict(type="LoadAnnotations", with_bbox=True),
        dict(type="Resize", img_scale=(1333, 800), keep_ratio=True),
        dict(type="RandomFlip", flip_ratio=0.5),
        dict(type="Normalize", **norm),
        dict(type="Pad", size_divisor=32, size=(832, 1344)),
        dict(type="DefaultFormatBundle", max_gt=4),
        dict(type="Collect", keys=["img", "gt_bboxes", "gt_labels",
                                   "gt_valid"]),
    ]
    decode_pipe = [
        dict(type="LoadImageFromFile"),
        dict(type="Pad", size=(640, 640)),  # uniform stack for collate
        dict(type="Collect", keys=["img"]),
    ]

    rows = []
    for tag, pipe in (("full_pipeline", full_pipe),
                      ("decode_only", decode_pipe)):
        ds = build_dataset(dict(type="CocoDataset", ann_file=ann,
                                img_prefix=img_dir, pipeline=pipe,
                                test_mode=(tag == "decode_only")))
        for workers in (1, 2, 4):
            rate = drain(ds, batch=8, workers=workers)
            row = dict(config=tag, workers=workers,
                       img_per_sec=round(rate, 1),
                       img_per_sec_per_core=round(rate / cores, 1),
                       cores_needed_for_chip=round(chip_rate /
                                                   max(rate / cores, 1e-9),
                                                   1))
            rows.append(row)
            print(json.dumps(row), flush=True)

    best = max(r["img_per_sec_per_core"] for r in rows
               if r["config"] == "full_pipeline")
    print(json.dumps({
        "summary": "host feed requirement",
        "host_cores": cores,
        "chip_rate_img_s": chip_rate,
        "full_pipeline_img_s_per_core": best,
        "cores_to_feed_one_chip": round(chip_rate / best, 1),
    }))


if __name__ == "__main__":
    main()
