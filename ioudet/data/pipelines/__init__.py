from .compose import Compose
from .loading import LoadImageFromFile, LoadAnnotations, LoadProposals
from .transforms import (Resize, RandomFlip, Normalize, Pad,
                         PhotoMetricDistortion, Expand, MinIoURandomCrop,
                         RandomCrop)
from .formatting import DefaultFormatBundle, ImageToTensor, Collect
from .test_aug import MultiScaleFlipAug

__all__ = [
    "Compose", "LoadImageFromFile", "LoadAnnotations", "LoadProposals",
    "Resize", "RandomFlip", "Normalize", "Pad", "PhotoMetricDistortion",
    "Expand", "MinIoURandomCrop", "RandomCrop", "DefaultFormatBundle",
    "ImageToTensor", "Collect", "MultiScaleFlipAug",
]
