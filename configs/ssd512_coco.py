# SSD512 on COCO (ref: configs/ssd512_coco.py).
_base_ = "./ssd300_coco.py"
model = dict(
    backbone=dict(type="SSDVGG", input_size=512),
    bbox_head=dict(
        type="SSDHead", num_classes=81, input_size=512,
        in_channels_list=(512, 1024, 512, 256, 256, 256, 256),
        anchor_strides=(8, 16, 32, 64, 128, 256, 512),
        basesize_ratio_range=(0.1, 0.9),
        anchor_ratios_per_level=((2,), (2, 3), (2, 3), (2, 3), (2, 3),
                                 (2,), (2,))),
)
img_norm_cfg = dict(mean=[123.675, 116.28, 103.53], std=[1, 1, 1],
                    to_rgb=True)
train_pipeline = [
    dict(type="LoadImageFromFile"),
    dict(type="LoadAnnotations", with_bbox=True),
    dict(type="PhotoMetricDistortion"),
    dict(type="Expand", mean=img_norm_cfg["mean"], ratio_range=(1, 4)),
    dict(type="MinIoURandomCrop", min_ious=(0.1, 0.3, 0.5, 0.7, 0.9),
         min_crop_size=0.3),
    dict(type="Resize", img_scale=(512, 512), keep_ratio=False),
    dict(type="RandomFlip", flip_ratio=0.5),
    dict(type="Normalize", **img_norm_cfg),
    dict(type="Pad", size=(512, 512), orient_aware=False),
    dict(type="DefaultFormatBundle", max_gt=100),
    dict(type="Collect", keys=["img", "gt_bboxes", "gt_labels", "gt_valid"]),
]
test_pipeline = [
    dict(type="LoadImageFromFile"),
    dict(type="Resize", img_scale=(512, 512), keep_ratio=False),
    dict(type="Normalize", **img_norm_cfg),
    dict(type="Pad", size=(512, 512), orient_aware=False),
    dict(type="Collect", keys=["img"]),
]
data = dict(train=dict(pipeline=train_pipeline),
            val=dict(pipeline=test_pipeline),
            test=dict(pipeline=test_pipeline))
work_dir = "./work_dirs/ssd512_coco"
