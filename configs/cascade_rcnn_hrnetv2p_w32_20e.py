# Cascade R-CNN HRNetV2p-W32 20e (ref: configs/hrnet/
# cascade_rcnn_hrnetv2p_w32_20e.py).
_base_ = "./cascade_rcnn_r50_fpn_20e.py"
model = dict(
    backbone=dict(
        type="HRNet", _delete_=True,
        extra=dict(
            stage1=dict(num_modules=1, num_branches=1, num_blocks=(4,),
                        num_channels=(64,)),
            stage2=dict(num_modules=1, num_branches=2, num_blocks=(4, 4),
                        num_channels=(32, 64)),
            stage3=dict(num_modules=4, num_branches=3, num_blocks=(4, 4, 4),
                        num_channels=(32, 64, 128)),
            stage4=dict(num_modules=3, num_branches=4,
                        num_blocks=(4, 4, 4, 4),
                        num_channels=(32, 64, 128, 256)))),
    neck=dict(type="HRFPN", _delete_=True,
              in_channels=[32, 64, 128, 256], out_channels=256, num_outs=5),
)
work_dir = "./work_dirs/cascade_rcnn_hrnetv2p_w32_20e"
