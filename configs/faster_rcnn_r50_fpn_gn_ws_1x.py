# Faster R-CNN R-50-FPN with GN + Weight Standardization, 1x (ref:
# configs/gn+ws/faster_rcnn_r50_fpn_gn_ws_1x.py): ConvWS everywhere a conv
# is normalized, GN(32) throughout.
_base_ = "./faster_rcnn_r50_fpn_1x.py"
conv_cfg = dict(type="ConvWS")
norm_cfg = dict(type="GN", num_groups=32)
model = dict(
    backbone=dict(conv_cfg=conv_cfg, norm_cfg=norm_cfg, frozen_stages=1),
    neck=dict(conv_cfg=conv_cfg, norm_cfg=norm_cfg),
    bbox_head=dict(_delete_=True, type="ConvFCBBoxHead",
                   num_shared_convs=4, num_shared_fcs=1,
                   conv_out_channels=256, fc_out_channels=1024,
                   num_classes=81, in_channels=256, roi_feat_size=7,
                   target_means=[0.0, 0.0, 0.0, 0.0],
                   target_stds=[0.1, 0.1, 0.2, 0.2],
                   conv_cfg=conv_cfg, norm_cfg=norm_cfg),
)
work_dir = "./work_dirs/faster_rcnn_r50_fpn_gn_ws_1x"
