# IoU-aware RetinaNet with deformable convs in stages 3-4
# (ref: configs/dcn/* family: dcn=dict(...), stage_with_dcn=(F,F,T,T)).
_base_ = "iou_aware_retinanet_r50_fpn_1x.py"
model = dict(
    backbone=dict(stage_with_dcn=(False, False, True, True),
                  dcn_modulated=False),
)
work_dir = "./work_dirs/dcn_iou_aware_retinanet_r50_fpn_1x"
