# Cascade R-CNN R-50-FPN 1x (ref: configs/cascade_rcnn_r50_fpn_1x.py).
_base_ = "faster_rcnn_r50_fpn_1x.py"
model = dict(
    type="CascadeRCNN",
    num_stages=3,
    stage_loss_weights=[1.0, 0.5, 0.25],
    stage_pos_thrs=[0.5, 0.6, 0.7],
    bbox_head=[
        dict(type="SharedFCBBoxHead", num_classes=81, in_channels=256,
             fc_out_channels=1024, target_stds=[0.1, 0.1, 0.2, 0.2]),
        dict(type="SharedFCBBoxHead", num_classes=81, in_channels=256,
             fc_out_channels=1024, target_stds=[0.05, 0.05, 0.1, 0.1]),
        dict(type="SharedFCBBoxHead", num_classes=81, in_channels=256,
             fc_out_channels=1024,
             target_stds=[0.033, 0.033, 0.067, 0.067]),
    ],
)
work_dir = "./work_dirs/cascade_rcnn_r50_fpn_1x"
