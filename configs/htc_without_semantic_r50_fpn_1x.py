# HTC without the semantic branch (ref: configs/htc/
# htc_without_semantic_r50_fpn_1x.py).
_base_ = "./htc_r50_fpn_1x.py"
model = dict(semantic_head=None, semantic_roi_extractor=None)
img_norm_cfg = dict(mean=[123.675, 116.28, 103.53],
                    std=[58.395, 57.12, 57.375], to_rgb=True)
train_pipeline = [
    dict(type="LoadImageFromFile"),
    dict(type="LoadAnnotations", with_bbox=True, with_mask=True),
    dict(type="Resize", img_scale=(1333, 800), keep_ratio=True),
    dict(type="RandomFlip", flip_ratio=0.5),
    dict(type="Normalize", **img_norm_cfg),
    dict(type="Pad", size_divisor=32, size=(832, 1344)),
    dict(type="DefaultFormatBundle", max_gt=100),
    dict(type="Collect",
         keys=["img", "gt_bboxes", "gt_labels", "gt_valid", "gt_masks"]),
]
data = dict(train=dict(pipeline=train_pipeline, seg_prefix=None))
work_dir = "./work_dirs/htc_without_semantic_r50_fpn_1x"
