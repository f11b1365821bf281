# Faster R-CNN R-50-FPN on PASCAL VOC 07+12 (ref: configs/pascal_voc/
# faster_rcnn_r50_fpn_1x_voc0712.py).
_base_ = "./faster_rcnn_r50_fpn_1x.py"
model = dict(bbox_head=dict(num_classes=21))
dataset_type = "VOCDataset"
data_root = "data/VOCdevkit/"
img_norm_cfg = dict(mean=[123.675, 116.28, 103.53],
                    std=[58.395, 57.12, 57.375], to_rgb=True)
canvas = (640, 1024)
train_pipeline = [
    dict(type="LoadImageFromFile"),
    dict(type="LoadAnnotations", with_bbox=True),
    dict(type="Resize", img_scale=(1000, 600), keep_ratio=True),
    dict(type="RandomFlip", flip_ratio=0.5),
    dict(type="Normalize", **img_norm_cfg),
    dict(type="Pad", size_divisor=32, size=canvas),
    dict(type="DefaultFormatBundle", max_gt=100),
    dict(type="Collect", keys=["img", "gt_bboxes", "gt_labels", "gt_valid"]),
]
test_pipeline = [
    dict(type="LoadImageFromFile"),
    dict(type="Resize", img_scale=(1000, 600), keep_ratio=True),
    dict(type="Normalize", **img_norm_cfg),
    dict(type="Pad", size_divisor=32, size=canvas),
    dict(type="Collect", keys=["img"]),
]
data = dict(
    train=dict(type=dataset_type,
               ann_file=[data_root + "VOC2007/ImageSets/Main/trainval.txt",
                         data_root + "VOC2012/ImageSets/Main/trainval.txt"],
               img_prefix=[data_root + "VOC2007/", data_root + "VOC2012/"],
               pipeline=train_pipeline),
    val=dict(type=dataset_type,
             ann_file=data_root + "VOC2007/ImageSets/Main/test.txt",
             img_prefix=data_root + "VOC2007/", pipeline=test_pipeline,
             test_mode=True),
    test=dict(type=dataset_type,
              ann_file=data_root + "VOC2007/ImageSets/Main/test.txt",
              img_prefix=data_root + "VOC2007/", pipeline=test_pipeline,
              test_mode=True),
)
optimizer = dict(type="SGD", lr=0.01, momentum=0.9, weight_decay=0.0001)
lr_config = dict(policy="step", warmup="linear", warmup_iters=500,
                 warmup_ratio=1.0 / 3, step=[3])
total_epochs = 4
work_dir = "./work_dirs/faster_rcnn_r50_fpn_voc0712"
