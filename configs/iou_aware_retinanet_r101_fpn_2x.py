# IoU-aware RetinaNet R-101-FPN 2x (ref: fork config family).
_base_ = "./iou_aware_retinanet_r101_fpn_1x.py"
lr_config = dict(step=[16, 22])
total_epochs = 24
work_dir = "./work_dirs/iou_aware_retinanet_r101_fpn_2x"
