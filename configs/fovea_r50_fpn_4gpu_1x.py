# FoveaBox R-50-FPN 4gpu 1x (ref: configs/foveabox/fovea_r50_fpn_4x4_1x
# at the mmdetection-v1.1 vintage): anchor-free per-pixel fovea-region
# assignment, log-space corner-distance regression.
_base_ = "./fcos_r50_fpn_1x.py"
model = dict(
    type="FOVEA",
    bbox_head=dict(
        _delete_=True, type="FoveaHead", num_classes=81, in_channels=256,
        feat_channels=256, stacked_convs=4,
        strides=[8, 16, 32, 64, 128],
        base_edge_list=[16, 32, 64, 128, 256],
        scale_ranges=((1, 64), (32, 128), (64, 256), (128, 512), (256, 2048)),
        sigma=0.4, with_deform=False,
        loss_cls=dict(type="FocalLoss", use_sigmoid=True, gamma=1.50,
                      alpha=0.4, loss_weight=1.0),
        loss_bbox=dict(type="SmoothL1Loss", beta=0.11, loss_weight=0.75)),
)
train_cfg = dict()
test_cfg = dict(nms_pre=1000, score_thr=0.05,
                nms=dict(type="nms", iou_thr=0.5), max_per_img=100)
data = dict(imgs_per_gpu=4, workers_per_gpu=4)
work_dir = "./work_dirs/fovea_r50_fpn_4gpu_1x"
