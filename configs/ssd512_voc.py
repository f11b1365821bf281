# SSD512 on PASCAL VOC 07+12 (ref: configs/pascal_voc/ssd512_voc.py).
_base_ = "./ssd512_coco.py"
model = dict(bbox_head=dict(num_classes=21,
                            basesize_ratio_range=(0.15, 0.9)))
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
dataset_type = "VOCDataset"
data_root = "data/VOCdevkit/"
data = dict(
    train=dict(_delete_=True, type=dataset_type,
               ann_file=[data_root + "VOC2007/ImageSets/Main/trainval.txt",
                         data_root + "VOC2012/ImageSets/Main/trainval.txt"],
               img_prefix=[data_root + "VOC2007/", data_root + "VOC2012/"],
               pipeline=train_pipeline),
    val=dict(_delete_=True, type=dataset_type,
             ann_file=data_root + "VOC2007/ImageSets/Main/test.txt",
             img_prefix=data_root + "VOC2007/", pipeline=test_pipeline,
             test_mode=True),
    test=dict(_delete_=True, type=dataset_type,
              ann_file=data_root + "VOC2007/ImageSets/Main/test.txt",
              img_prefix=data_root + "VOC2007/", pipeline=test_pipeline,
              test_mode=True),
)
optimizer = dict(type="SGD", lr=1e-3, momentum=0.9, weight_decay=5e-4)
lr_config = dict(policy="step", warmup="linear", warmup_iters=500,
                 warmup_ratio=1.0 / 3, step=[16, 20])
total_epochs = 24
work_dir = "./work_dirs/ssd512_voc"
