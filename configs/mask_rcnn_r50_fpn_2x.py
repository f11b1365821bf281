# Mask R-CNN R-50-FPN 2x (ref: configs/mask_rcnn_r50_fpn_2x-vintage).
_base_ = "./mask_rcnn_r50_fpn_1x.py"
lr_config = dict(step=[16, 22])
total_epochs = 24
work_dir = "./work_dirs/mask_rcnn_r50_fpn_2x"
