# Faster R-CNN X-101-32x4d GN+WS 1x (ref: configs/gn+ws/faster_rcnn_x101_32x4d_fpn_gn_ws_1x.py).
_base_ = "./faster_rcnn_r50_fpn_gn_ws_1x.py"
model = dict(backbone=dict(type="ResNeXt", depth=101, groups=32,
                           base_width=4))
work_dir = "./work_dirs/faster_rcnn_x101_32x4d_fpn_gn_ws_1x"
