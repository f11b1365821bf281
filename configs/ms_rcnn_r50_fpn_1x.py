# Mask Scoring R-CNN R-50-FPN 1x (ref: configs/ms_rcnn/ms_rcnn_r50_fpn_1x.py):
# MaskIoUHead rescores detections by predicted mask quality.
_base_ = "./mask_rcnn_r50_fpn_1x.py"
model = dict(
    type="MaskScoringRCNN",
    mask_iou_head=dict(type="MaskIoUHead", num_convs=4, num_fcs=2,
                       in_channels=256, conv_out_channels=256,
                       fc_out_channels=1024, num_classes=81),
)
work_dir = "./work_dirs/ms_rcnn_r50_fpn_1x"
