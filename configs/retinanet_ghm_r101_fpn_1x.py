# GHM RetinaNet R-101-FPN 1x (ref: configs/ghm/retinanet_ghm_r101_fpn_1x.py).
_base_ = "./retinanet_ghm_r50_fpn_1x.py"
model = dict(backbone=dict(depth=101))
work_dir = "./work_dirs/retinanet_ghm_r101_fpn_1x"
