#!/usr/bin/env python
"""Closed-loop training ON the real TPU (VERDICT r4 next #3).

Every correctness/convergence assertion in the CI suite runs on the virtual
CPU mesh; the chip had only ever executed bench/profile programs.  This
tool runs the planted multi-class recipe (tests/test_convergence_multiclass
semantics) END TO END on the actual TPU: train a few hundred steps through
the production train path (fused Pallas assignment, focal custom_vjp, bf16
compute — all COMPILED, not interpreted), then decode with the production
TEST_CFG (class_topk + pre-NMS cap) and report AP + ms/step.

Prints JSON lines; the recorded output of a real run lives in
docs/MODEL_ZOO.md (round-5 section).  Exits nonzero if AP50 < 0.5 (the CPU
twin of this recipe reaches ~0.9+ — a chip-vs-CPU trajectory divergence
would show here).
"""

import json
import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                ".."))

import numpy as np


def make_planted_coco(root, n=16, seed=7):
    """Color-coded classes, 2-4 planted boxes per image (the
    test_convergence_multiclass recipe)."""
    from PIL import Image
    rng = np.random.default_rng(seed)
    colors = {1: [250, 40, 40], 2: [40, 250, 40], 3: [60, 60, 250]}
    images, annotations = [], []
    img_dir = os.path.join(root, "imgs")
    os.makedirs(img_dir, exist_ok=True)
    ann_id = 0
    for i in range(n):
        w, h = 96, 64
        arr = rng.integers(0, 60, (h, w, 3), np.uint8)
        cells = [(4, 4), (52, 4), (4, 36), (52, 36)]
        picks = rng.permutation(4)[:int(rng.integers(2, 5))]
        for c in picks:
            cx, cy = cells[c]
            bw, bh = int(rng.integers(20, 27)), int(rng.integers(18, 23))
            x = cx + int(rng.integers(0, 40 - bw))
            y = cy + int(rng.integers(0, 26 - bh))
            cat = int(rng.integers(1, 4))
            arr[y:y + bh, x:x + bw] = colors[cat]
            annotations.append(dict(id=ann_id, image_id=i, category_id=cat,
                                    bbox=[x, y, bw, bh], area=bw * bh,
                                    iscrowd=0))
            ann_id += 1
        Image.fromarray(arr).save(os.path.join(img_dir, f"{i}.jpg"))
        images.append(dict(id=i, file_name=f"{i}.jpg", width=w, height=h))
    ann = os.path.join(root, "ann.json")
    with open(ann, "w") as f:
        json.dump(dict(images=images, annotations=annotations,
                       categories=[dict(id=c, name=n_) for c, n_ in
                                   [(1, "red"), (2, "green"), (3, "blue")]]),
                  f)
    return ann, img_dir


def main():
    import random as pyrandom
    pyrandom.seed(4321)
    np.random.seed(4321)
    import jax
    import jax.numpy as jnp
    from ioudet.apis import single_device_test, train_detector
    from ioudet.data import build_dataset
    from ioudet.models import build_detector
    from ioudet.utils.config import Config

    backend = jax.default_backend()
    print(json.dumps({"backend": backend,
                      "device": str(jax.devices()[0])}), flush=True)

    root = tempfile.mkdtemp(prefix="tpu_smoke_")
    ann_file, img_dir = make_planted_coco(root)
    norm = dict(mean=(30.0, 30.0, 30.0), std=(60.0, 60.0, 60.0),
                to_rgb=False)
    pipe_train = [
        dict(type="LoadImageFromFile"),
        dict(type="LoadAnnotations", with_bbox=True),
        dict(type="Resize", img_scale=(96, 64), keep_ratio=True),
        dict(type="RandomFlip", flip_ratio=0.5),
        dict(type="Normalize", **norm),
        dict(type="Pad", size_divisor=32, size=(64, 96)),
        dict(type="DefaultFormatBundle", max_gt=4),
        dict(type="Collect", keys=["img", "gt_bboxes", "gt_labels",
                                   "gt_valid"]),
    ]
    pipe_test = [
        dict(type="LoadImageFromFile"),
        dict(type="Resize", img_scale=(96, 64), keep_ratio=True),
        dict(type="Normalize", **norm),
        dict(type="Pad", size_divisor=32, size=(64, 96)),
        dict(type="Collect", keys=["img"]),
    ]
    exact_test_cfg = dict(nms_pre=100, score_thr=0.05,
                          nms=dict(iou_thr=0.5), max_per_img=8,
                          rescoring_alpha=0.5)
    # the production decode switches (__graft_entry__.TEST_CFG shape)
    prod_test_cfg = dict(exact_test_cfg, class_topk=2, pre_nms_total=200)
    total_epochs = int(os.environ.get("SMOKE_EPOCHS", 90))
    cfg = Config.fromdict(dict(
        model=dict(
            type="IoUAwareRetinaNet",
            backbone=dict(type="ResNet", depth=18, frozen_stages=-1,
                          norm_cfg=dict(type="FrozenBN")),
            neck=dict(type="FPN", in_channels=[64, 128, 256, 512],
                      out_channels=32, start_level=1, add_extra_convs=True,
                      num_outs=5),
            bbox_head=dict(type="IoUAwareRetinaHead", num_classes=4,
                           in_channels=32, feat_channels=32, stacked_convs=1,
                           anchor_strides=(8, 16, 32, 64, 128),
                           loss_cls=dict(type="FocalLoss", use_sigmoid=True,
                                         gamma=2.0, alpha=0.25,
                                         loss_weight=1.0),
                           loss_bbox=dict(type="SmoothL1Loss", beta=0.11,
                                          loss_weight=1.0))),
        train_cfg=dict(assigner=dict(type="MaxIoUAssigner", pos_iou_thr=0.5,
                                     neg_iou_thr=0.4, min_pos_iou=0,
                                     ignore_iof_thr=-1),
                       allowed_border=-1, pos_weight=-1),
        test_cfg=exact_test_cfg,
        data=dict(imgs_per_gpu=8, workers_per_gpu=1,
                  train=dict(type="CocoDataset", ann_file=ann_file,
                             img_prefix=img_dir, pipeline=pipe_train),
                  val=dict(type="CocoDataset", ann_file=ann_file,
                           img_prefix=img_dir, pipeline=pipe_test,
                           test_mode=True)),
        optimizer=dict(type="SGD", lr=0.005, momentum=0.9,
                       weight_decay=0.0001),
        optimizer_config=dict(grad_clip=dict(max_norm=35)),
        lr_config=dict(policy="step", warmup="linear", warmup_iters=20,
                       warmup_ratio=0.1, step=[70]),
        checkpoint_config=dict(interval=10000),
        log_config=dict(interval=40),
        total_epochs=total_epochs,
        work_dir=os.path.join(root, "work"),
    ))
    det = build_detector(dict(cfg.model), cfg.get("train_cfg"),
                         cfg.get("test_cfg"))
    dataset = build_dataset(cfg.data["train"])

    t0 = time.perf_counter()
    state = train_detector(det, dataset, cfg, cfg.work_dir, n_devices=1,
                           auto_resume=False)
    train_s = time.perf_counter() - t0
    steps = int(np.asarray(state["step"]))
    print(json.dumps({"steps": steps,
                      "train_wall_s": round(train_s, 1),
                      "ms_per_step_incl_data": round(
                          1e3 * train_s / max(steps, 1), 1)}), flush=True)

    val = build_dataset(cfg.data["val"])
    import jax
    params = jax.tree.map(jnp.asarray, state["params"])
    out = {}
    for tag, tcfg in (("exact", exact_test_cfg), ("production",
                                                  prod_test_cfg)):
        det_t = build_detector(dict(cfg.model), cfg.get("train_cfg"),
                               dict(tcfg))
        results = single_device_test(det_t, params, val, imgs_per_batch=8,
                                     progress=False)
        metrics = val.evaluate(results)
        out[tag] = {k: round(float(v), 4) for k, v in metrics.items()}
        print(json.dumps({tag: out[tag]}), flush=True)

    ok = out["exact"].get("AP50", 0.0) > 0.5 and \
        out["production"].get("AP50", 0.0) > 0.5
    print(json.dumps({"ok": bool(ok), "backend": backend}))
    sys.exit(0 if ok else 1)


if __name__ == "__main__":
    main()
