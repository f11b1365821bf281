# Faster R-CNN with OHEM RoI sampling (ref capability: configs/
# faster_rcnn_ohem_r50_fpn_1x.py): RCNN candidates are hard-mined by their
# current classification loss from a no-grad head pass.
_base_ = "./faster_rcnn_r50_fpn_1x.py"
train_cfg = dict(
    rcnn=dict(sampler=dict(type="OHEMSampler", num=512, pos_fraction=0.25,
                           add_gt_as_proposals=True)),
)
work_dir = "./work_dirs/ohem_faster_rcnn_r50_fpn_1x"
