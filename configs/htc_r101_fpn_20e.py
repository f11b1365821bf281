# HTC R-101-FPN 20e (ref: configs/htc/htc_r101_fpn_20e.py).
_base_ = "./htc_r50_fpn_1x.py"
model = dict(backbone=dict(depth=101))
lr_config = dict(step=[16, 19])
total_epochs = 20
work_dir = "./work_dirs/htc_r101_fpn_20e"
