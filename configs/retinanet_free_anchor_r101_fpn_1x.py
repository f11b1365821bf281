# FreeAnchor RetinaNet R-101-FPN 1x (ref: configs/free_anchor/retinanet_free_anchor_r101_fpn_1x.py).
_base_ = "./retinanet_free_anchor_r50_fpn_1x.py"
model = dict(backbone=dict(depth=101))
work_dir = "./work_dirs/retinanet_free_anchor_r101_fpn_1x"
