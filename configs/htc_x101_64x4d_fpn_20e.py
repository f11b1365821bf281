# HTC X-101-64x4d-FPN 20e (ref: configs/htc/htc_x101_64x4d_fpn_20e_16gpu.py).
_base_ = "./htc_r101_fpn_20e.py"
model = dict(backbone=dict(_delete_=True, type="ResNeXt", depth=101, groups=64,
                           base_width=4, num_stages=4, out_indices=(0, 1, 2, 3),
                           frozen_stages=1, norm_cfg=dict(type="FrozenBN")))
work_dir = "./work_dirs/htc_x101_64x4d_fpn_20e"
