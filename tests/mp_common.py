"""Shared fixtures for the real multi-process tests (test_multiprocess.py
and tests/_mp_worker.py): a tiny deterministic in-memory dataset and a small
detector config, identical in every process by construction."""

import numpy as np


def small_detector_cfgs():
    cfg = dict(
        type="IoUAwareRetinaNet",
        backbone=dict(type="ResNet", depth=18, frozen_stages=1,
                      norm_cfg=dict(type="FrozenBN")),
        neck=dict(type="FPN", in_channels=[64, 128, 256, 512],
                  out_channels=32, start_level=1, add_extra_convs=True,
                  num_outs=5),
        bbox_head=dict(type="IoUAwareRetinaHead", num_classes=5,
                       in_channels=32, feat_channels=32, stacked_convs=1,
                       anchor_strides=(8, 16, 32, 64, 128),
                       loss_cls=dict(type="FocalLoss", use_sigmoid=True,
                                     gamma=2.0, alpha=0.25, loss_weight=1.0),
                       loss_bbox=dict(type="SmoothL1Loss", beta=0.11,
                                      loss_weight=1.0)))
    train_cfg = dict(assigner=dict(type="MaxIoUAssigner", pos_iou_thr=0.5,
                                   neg_iou_thr=0.4, min_pos_iou=0,
                                   ignore_iof_thr=-1),
                     allowed_border=-1, pos_weight=-1)
    test_cfg = dict(nms_pre=50, score_thr=0.05, nms=dict(iou_thr=0.5),
                    max_per_img=10)
    return cfg, train_cfg, test_cfg


class TinyDataset:
    """12 deterministic 64x64 images with 2 planted boxes each; serves both
    the train collate contract (gt_* keys) and the eval contract (idx,
    scale_factor)."""

    CANVAS = (64, 64)

    def __init__(self, n=12, seed=0):
        self.n = n
        rng = np.random.default_rng(seed)
        self.imgs = rng.normal(0, 1, (n,) + self.CANVAS + (3,)
                               ).astype(np.float32)
        xy = rng.uniform(0, 30, (n, 2, 2)).astype(np.float32)
        self.boxes = np.concatenate([xy, xy + 20], -1)
        self.labels = rng.integers(1, 5, (n, 2)).astype(np.int32)
        self.flag = np.zeros(n, np.uint8)

    def __len__(self):
        return self.n

    def __getitem__(self, idx):
        h, w = self.CANVAS
        return dict(
            img=self.imgs[idx],
            gt_bboxes=self.boxes[idx],
            gt_labels=self.labels[idx],
            gt_valid=np.ones((2,), bool),
            img_shape=np.asarray([h, w], np.int32),
            pad_shape=np.asarray([h, w], np.int32),
            scale_factor=np.float32(1.0),
            idx=np.int64(idx),
        )


TRAIN_KEYS = ("img", "gt_bboxes", "gt_labels", "gt_valid", "img_shape",
              "pad_shape")
