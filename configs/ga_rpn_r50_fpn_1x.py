# Guided-Anchoring RPN (ref: configs/guided_anchoring/ga_rpn_r50_fpn_1x.py).
_base_ = "./rpn_r50_fpn_1x.py"
model = dict(
    rpn_head=dict(
        type="GARPNHead", _delete_=True, num_classes=2,
        in_channels=256, feat_channels=256,
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
work_dir = "./work_dirs/ga_rpn_r50_fpn_1x"
