# IoU-aware RetinaNet X-101-32x4d-FPN 1x (ref: fork config family).
_base_ = "./iou_aware_retinanet_r50_fpn_1x.py"
model = dict(backbone=dict(type="ResNeXt", depth=101, groups=32,
                           base_width=4))
work_dir = "./work_dirs/iou_aware_retinanet_x101_32x4d_fpn_1x"
