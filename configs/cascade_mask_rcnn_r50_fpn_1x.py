# Cascade Mask R-CNN R-50-FPN 1x (ref: configs/cascade_mask_rcnn_r50_fpn_1x.py).
# mmdet's cascade-with-mask == HTC machinery with interleaving, info flow
# and the semantic branch all switched off.
_base_ = "./htc_without_semantic_r50_fpn_1x.py"
model = dict(interleaved=False, mask_info_flow=False)
work_dir = "./work_dirs/cascade_mask_rcnn_r50_fpn_1x"
