# Grid R-CNN R-50-FPN 2x (ref capability: configs/grid_rcnn/
# grid_rcnn_gn_head_r50_fpn_2x.py): localization via 9-point grid heatmaps
# instead of box regression at test time.
_base_ = "./faster_rcnn_r50_fpn_1x.py"
model = dict(
    type="GridRCNN",
    grid_roi_extractor=dict(type="SingleRoIExtractor", out_channels=256,
                            featmap_strides=[4, 8, 16, 32],
                            roi_layer=dict(out_size=14, sample_num=2)),
    grid_head=dict(type="GridHead", grid_points=9, num_convs=8,
                   in_channels=256, point_feat_channels=64,
                   conv_out_channels=576, heatmap_size=56),
)
train_cfg = dict(
    rcnn=dict(grid=dict(jitter_amplitude=0.15, extend_factor=2.0)),
)
lr_config = dict(step=[16, 22])
total_epochs = 24
work_dir = "./work_dirs/grid_rcnn_r50_fpn_2x"
