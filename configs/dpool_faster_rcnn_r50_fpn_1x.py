# Faster R-CNN + modulated deformable RoI pooling (ref: configs/dcn/
# faster_rcnn_mdpool_r50_fpn_1x.py): the RoI layer learns per-bin offsets
# and a sigmoid modulation mask.
_base_ = "./faster_rcnn_r50_fpn_1x.py"
model = dict(
    bbox_roi_extractor=dict(
        type="SingleRoIExtractor", out_channels=256,
        featmap_strides=[4, 8, 16, 32],
        roi_layer=dict(type="ModulatedDeformRoIPoolingPack", out_size=7,
                       sample_num=2, trans_std=0.1)),
)
work_dir = "./work_dirs/dpool_faster_rcnn_r50_fpn_1x"
