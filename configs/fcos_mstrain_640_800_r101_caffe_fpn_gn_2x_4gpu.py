# FCOS R-101 multi-scale 2x (ref: configs/fcos/
# fcos_mstrain_640_800_r101_caffe_fpn_gn_2x_4gpu.py).
_base_ = "./fcos_r50_caffe_fpn_gn_1x_4gpu.py"
model = dict(backbone=dict(depth=101))
img_norm_cfg = dict(mean=[102.9801, 115.9465, 122.7717],
                    std=[1.0, 1.0, 1.0], to_rgb=False)
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
work_dir = "./work_dirs/fcos_mstrain_640_800_r101_caffe_fpn_gn_2x_4gpu"
