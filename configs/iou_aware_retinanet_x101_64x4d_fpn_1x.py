# IoU-aware RetinaNet ResNeXt-101-64x4d-FPN 1x
# (ref: fork config; grouped conv via XLA feature_group_count)
_base_ = "iou_aware_retinanet_r50_fpn_1x.py"
model = dict(backbone=dict(type="ResNeXt", depth=101, groups=64, base_width=4))
work_dir = "./work_dirs/iou_aware_retinanet_x101_64x4d_fpn_1x"
