# Mask R-CNN R-101-FPN GN 2x (ref: configs/gn/mask_rcnn_r101_fpn_gn_2x.py).
_base_ = "./mask_rcnn_r50_fpn_gn_2x.py"
model = dict(backbone=dict(depth=101))
work_dir = "./work_dirs/mask_rcnn_r101_fpn_gn_2x"
