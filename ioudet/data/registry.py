"""Data-layer registries (ref: mmdet/datasets/registry.py)."""

from ..utils.registry import Registry

DATASETS = Registry("dataset")
PIPELINES = Registry("pipeline")
