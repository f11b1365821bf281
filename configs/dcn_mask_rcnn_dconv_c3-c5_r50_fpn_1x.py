# DCN Mask R-CNN (ref: configs/dcn/mask_rcnn_dconv_c3-c5_r50_fpn_1x.py).
_base_ = "./mask_rcnn_r50_fpn_1x.py"
model = dict(backbone=dict(stage_with_dcn=(False, True, True, True)))
work_dir = "./work_dirs/dcn_mask_rcnn_dconv_c3-c5_r50_fpn_1x"
