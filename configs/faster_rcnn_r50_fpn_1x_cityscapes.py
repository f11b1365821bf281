# Faster R-CNN on Cityscapes (ref: configs/cityscapes/
# faster_rcnn_r50_fpn_1x_cityscapes.py): 8 instance classes, COCO-format
# annotations.
_base_ = "./faster_rcnn_r50_fpn_1x.py"
model = dict(bbox_head=dict(num_classes=9))
dataset_type = "CityscapesDataset"
data_root = "data/cityscapes/"
data = dict(
    train=dict(type=dataset_type,
               ann_file=data_root +
               "annotations/instancesonly_filtered_gtFine_train.json",
               img_prefix=data_root + "leftImg8bit/train/"),
    val=dict(type=dataset_type,
             ann_file=data_root +
             "annotations/instancesonly_filtered_gtFine_val.json",
             img_prefix=data_root + "leftImg8bit/val/"),
    test=dict(type=dataset_type,
              ann_file=data_root +
              "annotations/instancesonly_filtered_gtFine_val.json",
              img_prefix=data_root + "leftImg8bit/val/"),
)
optimizer = dict(type="SGD", lr=0.01, momentum=0.9, weight_decay=0.0001)
lr_config = dict(policy="step", warmup="linear", warmup_iters=500,
                 warmup_ratio=1.0 / 3, step=[6])
total_epochs = 8
work_dir = "./work_dirs/faster_rcnn_r50_fpn_1x_cityscapes"
