from .compose import Compose
from .loading import LoadImageFromFile, LoadAnnotations, LoadProposals
from .transforms import (Resize, RandomFlip, Normalize, Pad,
                         PhotoMetricDistortion, Expand, MinIoURandomCrop,
                         RandomCrop, SegRescale)
from .formatting import DefaultFormatBundle, ImageToTensor, Collect
from .test_aug import MultiScaleFlipAug

__all__ = [
    "Compose", "LoadImageFromFile", "LoadAnnotations", "LoadProposals",
    "Resize", "RandomFlip", "Normalize", "Pad", "PhotoMetricDistortion",
    "Expand", "MinIoURandomCrop", "RandomCrop", "SegRescale",
    "DefaultFormatBundle",
    "ImageToTensor", "Collect", "MultiScaleFlipAug",
]
