# Empirical attention 0010 + DCN (ref: configs/empirical_attention/
# faster_rcnn_r50_fpn_attention_0010_dcn_1x.py).
_base_ = "./faster_rcnn_r50_fpn_attention_0010_1x.py"
model = dict(backbone=dict(
    stage_with_dcn=(False, True, True, True), dcn_modulated=False))
work_dir = "./work_dirs/faster_rcnn_r50_fpn_attention_0010_dcn_1x"
