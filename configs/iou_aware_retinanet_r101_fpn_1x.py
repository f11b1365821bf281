# IoU-aware RetinaNet R-101-FPN 1x (ref: fork config with ResNet-101)
_base_ = "iou_aware_retinanet_r50_fpn_1x.py"
model = dict(backbone=dict(depth=101))
work_dir = "./work_dirs/iou_aware_retinanet_r101_fpn_1x"
