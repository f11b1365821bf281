# IoU-aware RetinaNet R-50-FPN multi-scale train, 2x (ref: fork mstrain
# recipe: short side sampled in [640, 800]).
_base_ = "./iou_aware_retinanet_r50_fpn_1x.py"
img_norm_cfg = dict(mean=[123.675, 116.28, 103.53],
                    std=[58.395, 57.12, 57.375], to_rgb=True)
train_pipeline = [
    dict(type="LoadImageFromFile"),
    dict(type="LoadAnnotations", with_bbox=True),
    dict(type="Resize", img_scale=[(1333, 640), (1333, 800)],
         multiscale_mode="range", keep_ratio=True),
    dict(type="RandomFlip", flip_ratio=0.5),
    dict(type="Normalize", **img_norm_cfg),
    dict(type="Pad", size_divisor=32, size=(832, 1344)),
    dict(type="DefaultFormatBundle", max_gt=100),
    dict(type="Collect", keys=["img", "gt_bboxes", "gt_labels", "gt_valid"]),
]
data = dict(train=dict(pipeline=train_pipeline))
lr_config = dict(step=[16, 22])
total_epochs = 24
work_dir = "./work_dirs/iou_aware_retinanet_r50_fpn_mstrain_2x"
