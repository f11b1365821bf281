# Faster R-CNN R-50-FPN, GeneralizedAttention '1111' + DCN in c3-c5 (ref:
# configs/empirical_attention/faster_rcnn_r50_fpn_attention_1111_dcn_1x.py).
_base_ = "./faster_rcnn_r50_fpn_attention_1111_1x.py"
model = dict(
    backbone=dict(
        stage_with_dcn=[False, True, True, True],
    ))
work_dir = "./work_dirs/faster_rcnn_r50_fpn_attention_1111_dcn_1x"
