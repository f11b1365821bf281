# Guided-Anchoring Faster R-CNN R-50-FPN 1x (ref: configs/guided_anchoring/
# ga_faster_r50_caffe_fpn_1x.py — pytorch-style backbone here): GA-RPN
# proposals feed the standard R-CNN head.
_base_ = "./faster_rcnn_r50_fpn_1x.py"
model = dict(
    rpn_head=dict(
        _delete_=True,
        type="GARPNHead", num_classes=2, in_channels=256, feat_channels=256,
        octave_base_scale=8, scales_per_octave=3,
        anchor_ratios=[0.5, 1.0, 2.0],
        anchor_strides=[4, 8, 16, 32, 64],
        anchoring_means=[0.0, 0.0, 0.0, 0.0],
        anchoring_stds=[0.07, 0.07, 0.14, 0.14],
        target_means=[0.0, 0.0, 0.0, 0.0],
        target_stds=[0.07, 0.07, 0.11, 0.11],
        loc_filter_thr=0.01,
        loss_cls=dict(type="CrossEntropyLoss", use_sigmoid=True,
                      loss_weight=1.0),
        loss_bbox=dict(type="SmoothL1Loss", beta=1.0, loss_weight=1.0)),
)
train_cfg = dict(
    rpn=dict(
        ga_assigner=dict(type="ApproxMaxIoUAssigner", pos_iou_thr=0.7,
                         neg_iou_thr=0.3, min_pos_iou=0.3),
        center_ratio=0.2, ignore_ratio=0.5),
)
work_dir = "./work_dirs/ga_faster_rcnn_r50_fpn_1x"
