# SSD300 on WIDER Face (ref: configs/wider_face/ssd300_wider_face.py):
# single-class face detection with the WIDERFaceDataset (XML annotations).
_base_ = "./ssd300_coco.py"
model = dict(
    bbox_head=dict(num_classes=2),
)
dataset_type = "WIDERFaceDataset"
data_root = "data/WIDERFace/"
img_norm_cfg = dict(mean=[123.675, 116.28, 103.53], std=[1, 1, 1],
                    to_rgb=True)
train_pipeline = [
    dict(type="LoadImageFromFile"),
    dict(type="LoadAnnotations", with_bbox=True),
    dict(type="PhotoMetricDistortion"),
    dict(type="Expand", mean=img_norm_cfg["mean"], ratio_range=(1, 4)),
    dict(type="MinIoURandomCrop", min_ious=(0.1, 0.3, 0.5, 0.7, 0.9),
         min_crop_size=0.3),
    dict(type="Resize", img_scale=(300, 300), keep_ratio=False),
    dict(type="RandomFlip", flip_ratio=0.5),
    dict(type="Normalize", **img_norm_cfg),
    dict(type="Pad", size=(300, 300), orient_aware=False),
    dict(type="DefaultFormatBundle", max_gt=100),
    dict(type="Collect", keys=["img", "gt_bboxes", "gt_labels", "gt_valid"]),
]
test_pipeline = [
    dict(type="LoadImageFromFile"),
    dict(type="Resize", img_scale=(300, 300), keep_ratio=False),
    dict(type="Normalize", **img_norm_cfg),
    dict(type="Pad", size=(300, 300), orient_aware=False),
    dict(type="Collect", keys=["img"]),
]
data = dict(
    imgs_per_gpu=60, workers_per_gpu=2,
    train=dict(type=dataset_type,
               ann_file=data_root + "train.txt",
               img_prefix=data_root + "WIDER_train/",
               min_size=17, pipeline=train_pipeline),
    val=dict(type=dataset_type,
             ann_file=data_root + "val.txt",
             img_prefix=data_root + "WIDER_val/",
             pipeline=test_pipeline, test_mode=True),
    test=dict(type=dataset_type,
              ann_file=data_root + "val.txt",
              img_prefix=data_root + "WIDER_val/",
              pipeline=test_pipeline, test_mode=True),
)
optimizer = dict(type="SGD", lr=0.012, momentum=0.9, weight_decay=5e-4)
lr_config = dict(policy="step", warmup="linear", warmup_iters=1000,
                 warmup_ratio=1.0 / 3, step=[16, 20])
total_epochs = 24
work_dir = "./work_dirs/ssd300_wider_face"
