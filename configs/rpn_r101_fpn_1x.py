# RPN R-101-FPN 1x (ref: configs/rpn_r101_fpn_1x.py).
_base_ = "./rpn_r50_fpn_1x.py"
model = dict(backbone=dict(depth=101))
work_dir = "./work_dirs/rpn_r101_fpn_1x"
