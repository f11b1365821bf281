# FCOS R-50-FPN 1x (ref: configs/fcos/*) — anchor-free family, self-contained.
model = dict(
    type="FCOS",
    backbone=dict(type="ResNet", depth=50, num_stages=4,
                  out_indices=(0, 1, 2, 3), frozen_stages=1,
                  norm_cfg=dict(type="FrozenBN")),
    neck=dict(type="FPN", in_channels=[256, 512, 1024, 2048],
              out_channels=256, start_level=1, add_extra_convs=True,
              num_outs=5),
    bbox_head=dict(type="FCOSHead", num_classes=81, in_channels=256,
                   feat_channels=256, stacked_convs=4,
                   strides=[8, 16, 32, 64, 128]),
)
train_cfg = dict()
test_cfg = dict(nms_pre=1000, score_thr=0.05,
                nms=dict(type="nms", iou_thr=0.5), max_per_img=100)
dataset_type = "CocoDataset"
data_root = "data/coco/"
img_norm_cfg = dict(mean=[123.675, 116.28, 103.53],
                    std=[58.395, 57.12, 57.375], to_rgb=True)
canvas = (832, 1344)
train_pipeline = [
    dict(type="LoadImageFromFile"),
    dict(type="LoadAnnotations", with_bbox=True),
    dict(type="Resize", img_scale=(1333, 800), keep_ratio=True),
    dict(type="RandomFlip", flip_ratio=0.5),
    dict(type="Normalize", **img_norm_cfg),
    dict(type="Pad", size_divisor=32, size=canvas),
    dict(type="DefaultFormatBundle", max_gt=100),
    dict(type="Collect", keys=["img", "gt_bboxes", "gt_labels", "gt_valid"]),
]
test_pipeline = [
    dict(type="LoadImageFromFile"),
    dict(type="Resize", img_scale=(1333, 800), keep_ratio=True),
    dict(type="Normalize", **img_norm_cfg),
    dict(type="Pad", size_divisor=32, size=canvas),
    dict(type="Collect", keys=["img"]),
]
data = dict(
    imgs_per_gpu=2, workers_per_gpu=2,
    train=dict(type=dataset_type,
               ann_file=data_root + "annotations/instances_train2017.json",
               img_prefix=data_root + "train2017/", pipeline=train_pipeline),
    val=dict(type=dataset_type,
             ann_file=data_root + "annotations/instances_val2017.json",
             img_prefix=data_root + "val2017/", pipeline=test_pipeline,
             test_mode=True),
    test=dict(type=dataset_type,
              ann_file=data_root + "annotations/instances_val2017.json",
              img_prefix=data_root + "val2017/", pipeline=test_pipeline,
              test_mode=True),
)
optimizer = dict(type="SGD", lr=0.01, momentum=0.9, weight_decay=0.0001)
optimizer_config = dict(grad_clip=None)
lr_config = dict(policy="step", warmup="constant", warmup_iters=500,
                 warmup_ratio=1.0 / 3, step=[8, 11])
checkpoint_config = dict(interval=1)
log_config = dict(interval=50)
total_epochs = 12
work_dir = "./work_dirs/fcos_r50_fpn_1x"
