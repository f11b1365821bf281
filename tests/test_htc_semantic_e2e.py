"""HTC's semantic branch end-to-end from DISK: stuffthingmaps PNGs ->
LoadAnnotations(with_seg) -> Resize/Flip/Pad -> SegRescale(1/8) -> loader ->
one jitted train step with a finite, seg-dependent loss_semantic_seg.

Closes the last ROADMAP breadth gap: the FusedSemanticHead was trained only
on synthetic in-memory label maps (tests/test_longtail_detectors.py); the
stuff-map FILE path (ref: mmdet/datasets/pipelines/loading.py
(LoadAnnotations with_seg reading seg_prefix/<img>.png) +
transforms.py (SegRescale), configs/htc/*) was untested.
"""

import json

import numpy as np
import pytest

import jax
import jax.numpy as jnp

CANVAS = (96, 128)          # (h, w), divisor-32 aligned
STUFF_CLASSES = 8


@pytest.fixture(scope="module")
def coco_stuff_tree(tmp_path_factory):
    """4-image COCO tree + stuffthingmaps dir.  Every stuff map has a
    deterministic two-band layout (top band = class (i % 7) + 1, bottom
    band = 0) so the loaded values are checkable after rescale."""
    from PIL import Image

    root = tmp_path_factory.mktemp("cocostuff")
    img_dir = root / "train2017"
    seg_dir = root / "stuffthingmaps" / "train2017"
    img_dir.mkdir(parents=True)
    seg_dir.mkdir(parents=True)
    rng = np.random.default_rng(0)
    images, annotations = [], []
    h, w = CANVAS
    for i in range(4):
        arr = rng.integers(0, 255, (h, w, 3), np.uint8)
        x, y, bw, bh = 20 + 6 * i, 14, 40, 36
        arr[y:y + bh, x:x + bw] = [220, 50, 50]
        name = f"{i:012d}.jpg"
        Image.fromarray(arr).save(img_dir / name)
        seg = np.zeros((h, w), np.uint8)
        seg[: h // 2] = (i % (STUFF_CLASSES - 1)) + 1
        seg[-8:] = 255                      # ignore band (COCO-stuff style)
        Image.fromarray(seg).save(seg_dir / f"{i:012d}.png")
        images.append(dict(id=i, file_name=name, width=w, height=h))
        annotations.append(dict(
            id=i, image_id=i, category_id=(i % 3) + 1,
            bbox=[x, y, bw, bh], area=bw * bh, iscrowd=0,
            segmentation=[[x, y, x + bw, y, x + bw, y + bh, x, y + bh]]))
    categories = [dict(id=c + 1, name=f"thing{c}") for c in range(3)]
    ann = root / "instances_train2017.json"
    ann.write_text(json.dumps(dict(images=images, annotations=annotations,
                                   categories=categories)))
    return str(ann), str(img_dir), str(seg_dir)


def _train_pipeline():
    return [
        dict(type="LoadImageFromFile"),
        dict(type="LoadAnnotations", with_bbox=True, with_label=True,
             with_mask=True, with_seg=True, mask_size=28),
        dict(type="Resize", img_scale=(CANVAS[1], CANVAS[0]),
             keep_ratio=True),
        dict(type="RandomFlip", flip_ratio=0.0),
        dict(type="Normalize", mean=(123.675, 116.28, 103.53),
             std=(58.395, 57.12, 57.375), to_rgb=True),
        dict(type="Pad", size_divisor=32, size=CANVAS),
        dict(type="SegRescale", scale_factor=1 / 8),
        dict(type="DefaultFormatBundle", max_gt=4),
        dict(type="Collect", keys=["img", "gt_bboxes", "gt_labels",
                                   "gt_valid", "gt_masks",
                                   "gt_semantic_seg"]),
    ]


def _htc(ch=32):
    from ioudet.models import build_detector

    stage = lambda stds: dict(type="SharedFCBBoxHead", num_classes=4,
                              in_channels=ch, fc_out_channels=32,
                              target_stds=stds)
    cfg = dict(
        type="HybridTaskCascade",
        num_stages=2,
        stage_loss_weights=(1.0, 0.5),
        stage_pos_thrs=(0.5, 0.6),
        backbone=dict(type="ResNet", depth=18, frozen_stages=1,
                      norm_cfg=dict(type="FrozenBN")),
        neck=dict(type="FPN", in_channels=[64, 128, 256, 512],
                  out_channels=ch, num_outs=5),
        rpn_head=dict(type="RPNHead", num_classes=2, in_channels=ch,
                      feat_channels=ch, anchor_scales=(8,),
                      anchor_ratios=(0.5, 1.0, 2.0),
                      anchor_strides=(4, 8, 16, 32, 64),
                      loss_cls=dict(type="FocalLoss", use_sigmoid=True,
                                    gamma=2.0, alpha=0.25, loss_weight=1.0),
                      loss_bbox=dict(type="SmoothL1Loss", beta=0.11,
                                     loss_weight=1.0)),
        bbox_roi_extractor=dict(type="SingleRoIExtractor", out_channels=ch,
                                featmap_strides=(4, 8, 16, 32),
                                roi_layer=dict(out_size=7, sample_num=2)),
        bbox_head=[stage([0.1, 0.1, 0.2, 0.2]),
                   stage([0.05, 0.05, 0.1, 0.1])],
        mask_roi_extractor=dict(type="SingleRoIExtractor", out_channels=ch,
                                featmap_strides=(4, 8, 16, 32),
                                roi_layer=dict(out_size=14, sample_num=2)),
        mask_head=[dict(type="HTCMaskHead", num_convs=2, in_channels=ch,
                        conv_out_channels=ch, num_classes=4),
                   dict(type="HTCMaskHead", num_convs=2, in_channels=ch,
                        conv_out_channels=ch, num_classes=4)],
        semantic_roi_extractor=dict(type="SingleRoIExtractor",
                                    out_channels=ch, featmap_strides=(8,),
                                    roi_layer=dict(out_size=14,
                                                   sample_num=2)),
        semantic_head=dict(type="FusedSemanticHead", num_ins=5,
                           fusion_level=1, num_convs=2, in_channels=ch,
                           conv_out_channels=ch,
                           num_classes=STUFF_CLASSES, loss_weight=0.2))
    train_cfg = dict(
        rpn=dict(assigner=dict(type="MaxIoUAssigner", pos_iou_thr=0.7,
                               neg_iou_thr=0.3, min_pos_iou=0.3),
                 allowed_border=0),
        rpn_proposal=dict(nms_pre=200, max_num=64, nms_thr=0.7),
        rcnn=dict(sampler=dict(num=32, pos_fraction=0.25)))
    test_cfg = dict(rpn=dict(nms_pre=100, max_num=32, nms_thr=0.7),
                    rcnn=dict(score_thr=0.05, nms=dict(iou_thr=0.5),
                              max_per_img=8))
    return build_detector(cfg, train_cfg, test_cfg)


def test_stuffmap_loads_and_rescales(coco_stuff_tree):
    from ioudet.data import build_dataset

    ann_file, img_dir, seg_dir = coco_stuff_tree
    ds = build_dataset(dict(type="CocoDataset", ann_file=ann_file,
                            img_prefix=img_dir, seg_prefix=seg_dir,
                            pipeline=_train_pipeline(),
                            filter_empty_gt=False))
    s = ds[1]
    seg = np.asarray(s["gt_semantic_seg"])
    assert seg.shape == (CANVAS[0] // 8, CANVAS[1] // 8)
    # top band carries the planted class, bottom row the 255 ignore band —
    # proving the PNG was read from seg_prefix (the missing-file fallback
    # is all-255)
    assert (seg[:4] == 2).all(), seg[:4]
    assert (seg[-1] == 255).all()
    assert (seg != 255).any()


def test_htc_trains_from_disk_stuffmaps(coco_stuff_tree):
    from ioudet.apis.train import build_optimizer, make_train_step
    from ioudet.data import build_dataloader, build_dataset

    ann_file, img_dir, seg_dir = coco_stuff_tree
    ds = build_dataset(dict(type="CocoDataset", ann_file=ann_file,
                            img_prefix=img_dir, seg_prefix=seg_dir,
                            pipeline=_train_pipeline(),
                            filter_empty_gt=False))
    loader = build_dataloader(ds, imgs_per_gpu=2, workers_per_gpu=1,
                              shuffle=False, drop_last=False)
    batch = next(iter(loader))
    keep = ("img", "gt_bboxes", "gt_labels", "gt_valid", "gt_masks",
            "gt_semantic_seg", "img_shape", "pad_shape")
    batch = {k: jnp.asarray(v) for k, v in batch.items() if k in keep}
    assert batch["gt_semantic_seg"].shape == (2, CANVAS[0] // 8,
                                              CANVAS[1] // 8)

    det = _htc()
    variables = det.init(
        {"params": jax.random.PRNGKey(0), "sampler": jax.random.PRNGKey(7)},
        batch["img"], batch["gt_bboxes"], batch["gt_labels"],
        batch["gt_valid"], batch["img_shape"], batch["pad_shape"],
        batch["gt_masks"], gt_semantic_seg=batch["gt_semantic_seg"],
        method=det.forward_train)
    tx = build_optimizer(dict(type="SGD", lr=0.01, momentum=0.9),
                         lambda s: 0.01)
    state = dict(params=variables["params"],
                 opt_state=tx.init(variables["params"]),
                 step=jnp.zeros((), jnp.int32))
    step_fn = make_train_step(det, tx)
    state, logs = step_fn(state, batch)
    assert "loss_semantic_seg" in logs
    assert np.isfinite(float(logs["loss"])), logs
    sem = float(logs["loss_semantic_seg"])
    assert np.isfinite(sem) and sem > 0.0

    # the semantic loss must actually depend on the loaded maps: an
    # all-ignore map (the missing-file fallback) must change it
    b2 = dict(batch)
    b2["gt_semantic_seg"] = jnp.full_like(batch["gt_semantic_seg"], 255)
    _, logs2 = step_fn(state, b2)
    assert abs(float(logs2["loss_semantic_seg"]) - sem) > 1e-6
