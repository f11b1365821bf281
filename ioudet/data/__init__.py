from .registry import DATASETS, PIPELINES
from .builder import build_dataset
from .loader import DataLoader, build_dataloader, collate, GroupedBatchSampler
from . import datasets, pipelines  # register everything

__all__ = ["DATASETS", "PIPELINES", "build_dataset", "DataLoader",
           "build_dataloader", "collate", "GroupedBatchSampler"]
