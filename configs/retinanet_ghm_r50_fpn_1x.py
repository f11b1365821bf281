# RetinaNet with gradient-harmonizing losses (ref:
# configs/ghm/retinanet_ghm_r50_fpn_1x.py — reference constants: GHMC
# bins=30 momentum=0.75, GHMR mu=0.02 bins=10 momentum=0.7 loss_weight=10).
# GHM losses take (pred, one-hot target, label_weight); the head's focal
# path expects int labels, so GHM plugs in through the loss registry with a
# thin adapter below (the reference's GHMC has the same signature split).
# momentum > 0 carries the EMA bin counts as a flax 'ghm' collection in the
# train state (models/losses/ghm_loss.py).
_base_ = "retinanet_r50_fpn_1x.py"
model = dict(
    bbox_head=dict(
        loss_cls=dict(type="GHMCAdapter", bins=30, momentum=0.75,
                      loss_weight=1.0,
                      use_sigmoid=None, gamma=None, alpha=None),
        loss_bbox=dict(type="GHMRAdapter", mu=0.02, bins=10, momentum=0.7,
                       loss_weight=10.0, beta=None),
    ),
)
work_dir = "./work_dirs/retinanet_ghm_r50_fpn_1x"
