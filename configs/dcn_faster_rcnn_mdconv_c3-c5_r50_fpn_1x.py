# Modulated DCN (v2) Faster R-CNN (ref: configs/dcn/
# faster_rcnn_mdconv_c3-c5_r50_fpn_1x.py).
_base_ = "./faster_rcnn_r50_fpn_1x.py"
model = dict(backbone=dict(stage_with_dcn=(False, True, True, True),
                           dcn_modulated=True))
work_dir = "./work_dirs/dcn_faster_rcnn_mdconv_c3-c5_r50_fpn_1x"
