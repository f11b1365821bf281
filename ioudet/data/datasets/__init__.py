from .custom import CustomDataset
from .coco import CocoDataset
from .xml_style import XMLDataset, VOCDataset, WIDERFaceDataset
from .cityscapes import CityscapesDataset
from .wrappers import ConcatDataset, RepeatDataset

__all__ = ["CustomDataset", "CocoDataset", "XMLDataset", "VOCDataset",
           "WIDERFaceDataset", "CityscapesDataset", "ConcatDataset",
           "RepeatDataset"]
