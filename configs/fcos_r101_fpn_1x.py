# FCOS R-101-FPN 1x (ref: configs/fcos/fcos_r101_caffe_fpn_gn_1x.py vintage).
_base_ = "./fcos_r50_fpn_1x.py"
model = dict(backbone=dict(depth=101))
work_dir = "./work_dirs/fcos_r101_fpn_1x"
