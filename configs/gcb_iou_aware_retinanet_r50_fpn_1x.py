# IoU-aware RetinaNet with global-context blocks in stages 3-4
# (ref: configs/gcb/* family via ContextBlock plugin).
_base_ = "iou_aware_retinanet_r50_fpn_1x.py"
model = dict(
    backbone=dict(stage_with_gcb=(False, False, True, True)),
)
work_dir = "./work_dirs/gcb_iou_aware_retinanet_r50_fpn_1x"
