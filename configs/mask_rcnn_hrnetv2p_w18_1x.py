# Mask R-CNN HRNetV2p-W18 (ref: configs/hrnet/mask_rcnn_hrnetv2p_w18_1x.py).
_base_ = "./mask_rcnn_r50_fpn_1x.py"
model = dict(
    backbone=dict(
        type="HRNet", _delete_=True,
        extra=dict(
            stage1=dict(num_modules=1, num_branches=1, num_blocks=(4,),
                        num_channels=(64,)),
            stage2=dict(num_modules=1, num_branches=2, num_blocks=(4, 4),
                        num_channels=(18, 36)),
            stage3=dict(num_modules=4, num_branches=3, num_blocks=(4, 4, 4),
                        num_channels=(18, 36, 72)),
            stage4=dict(num_modules=3, num_branches=4,
                        num_blocks=(4, 4, 4, 4),
                        num_channels=(18, 36, 72, 144)))),
    neck=dict(type="HRFPN", _delete_=True,
              in_channels=[18, 36, 72, 144], out_channels=256, num_outs=5),
)
work_dir = "./work_dirs/mask_rcnn_hrnetv2p_w18_1x"
