# Faster R-CNN HRNetV2p-W32 (ref: configs/hrnet/faster_rcnn_hrnetv2p_w32_1x.py).
_base_ = "./faster_rcnn_hrnetv2p_w18_1x.py"
model = dict(
    backbone=dict(extra=dict(
        stage2=dict(num_channels=(32, 64)),
        stage3=dict(num_channels=(32, 64, 128)),
        stage4=dict(num_channels=(32, 64, 128, 256)))),
    neck=dict(in_channels=[32, 64, 128, 256]),
)
work_dir = "./work_dirs/faster_rcnn_hrnetv2p_w32_1x"
