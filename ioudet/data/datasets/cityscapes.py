"""Cityscapes detection dataset (ref: mmdet/datasets/cityscapes.py
(CityscapesDataset)): COCO-format annotations with the 8 cityscapes
categories."""

from ...core.evaluation.class_names import CITYSCAPES_CLASSES
from ..registry import DATASETS
from .coco import CocoDataset


@DATASETS.register_module
class CityscapesDataset(CocoDataset):
    CLASSES = CITYSCAPES_CLASSES
