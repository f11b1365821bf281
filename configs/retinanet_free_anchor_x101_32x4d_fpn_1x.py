# FreeAnchor RetinaNet X-101-32x4d-FPN 1x (ref: configs/free_anchor/retinanet_free_anchor_x101-32x4d_fpn_1x.py).
_base_ = "./retinanet_free_anchor_r50_fpn_1x.py"
model = dict(backbone=dict(_delete_=True, type="ResNeXt", depth=101, groups=32,
                           base_width=4, num_stages=4, out_indices=(0, 1, 2, 3),
                           frozen_stages=1, norm_cfg=dict(type="FrozenBN")))
work_dir = "./work_dirs/retinanet_free_anchor_x101_32x4d_fpn_1x"
