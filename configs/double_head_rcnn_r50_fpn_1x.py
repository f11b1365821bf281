# Double-Head R-CNN R-50-FPN 1x (ref capability: configs/double_heads/
# dh_faster_rcnn_r50_fpn_1x.py): conv branch regresses, fc branch
# classifies, both losses weighted 2.0.
_base_ = "./faster_rcnn_r50_fpn_1x.py"
model = dict(
    type="DoubleHeadRCNN",
    bbox_head=dict(type="DoubleConvFCBBoxHead", num_convs=4, num_fcs=2,
                   in_channels=256, conv_out_channels=1024,
                   fc_out_channels=1024, num_classes=81, roi_feat_size=7,
                   norm_cfg=dict(type="BN"),
                   target_means=[0.0, 0.0, 0.0, 0.0],
                   target_stds=[0.1, 0.1, 0.2, 0.2],
                   cls_loss_weight=2.0, bbox_loss_weight=2.0),
)
work_dir = "./work_dirs/double_head_rcnn_r50_fpn_1x"
