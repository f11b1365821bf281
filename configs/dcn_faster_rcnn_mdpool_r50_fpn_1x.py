# Modulated deformable RoI pooling Faster R-CNN (ref: configs/dcn/
# faster_rcnn_mdpool_r50_fpn_1x.py).
_base_ = "./faster_rcnn_r50_fpn_1x.py"
model = dict(bbox_roi_extractor=dict(
    roi_layer=dict(type="ModulatedDeformRoIPoolingPack", out_size=7,
                   sample_num=2)))
work_dir = "./work_dirs/dcn_faster_rcnn_mdpool_r50_fpn_1x"
