# GA-RetinaNet R-50-caffe-FPN 1x (ref: configs/guided_anchoring/
# ga_retinanet_r50_caffe_fpn_1x.py): caffe-style backbone (stride on the
# 1x1) + caffe image normalization (BGR, identity std).
_base_ = "./ga_retinanet_r50_fpn_1x.py"
model = dict(backbone=dict(style="caffe"))
img_norm_cfg = dict(mean=[102.9801, 115.9465, 122.7717],
                    std=[1.0, 1.0, 1.0], to_rgb=False)
train_pipeline = [
    dict(type="LoadImageFromFile"),
    dict(type="LoadAnnotations", with_bbox=True),
    dict(type="Resize", img_scale=(1333, 800), keep_ratio=True),
    dict(type="RandomFlip", flip_ratio=0.5),
    dict(type="Normalize", **img_norm_cfg),
    dict(type="Pad", size_divisor=32, size=(832, 1344)),
    dict(type="DefaultFormatBundle", max_gt=100),
    dict(type="Collect", keys=["img", "gt_bboxes", "gt_labels", "gt_valid"]),
]
test_pipeline = [
    dict(type="LoadImageFromFile"),
    dict(type="Resize", img_scale=(1333, 800), keep_ratio=True),
    dict(type="Normalize", **img_norm_cfg),
    dict(type="Pad", size_divisor=32, size=(832, 1344)),
    dict(type="Collect", keys=["img"]),
]
data = dict(train=dict(pipeline=train_pipeline),
            val=dict(pipeline=test_pipeline),
            test=dict(pipeline=test_pipeline))
work_dir = "./work_dirs/ga_retinanet_r50_caffe_fpn_1x"
