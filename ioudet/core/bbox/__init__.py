from .geometry import bbox_overlaps
from .transforms import (bbox2delta, delta2bbox, bbox_flip, bbox_mapping,
                         bbox_mapping_back, distance2bbox, bbox2result)
from .assigners import (MaxIoUAssigner, ApproxMaxIoUAssigner, PointAssigner,
                        assign_max_iou)
from .samplers import (PseudoSampler, RandomSampler,
                       InstanceBalancedPosSampler, IoUBalancedNegSampler,
                       OHEMSampler, CombinedSampler)

__all__ = [
    "bbox_overlaps", "bbox2delta", "delta2bbox", "bbox_flip", "bbox_mapping",
    "bbox_mapping_back", "distance2bbox", "bbox2result", "MaxIoUAssigner",
    "ApproxMaxIoUAssigner", "PointAssigner",
    "assign_max_iou", "PseudoSampler", "RandomSampler",
    "InstanceBalancedPosSampler", "IoUBalancedNegSampler", "OHEMSampler",
    "CombinedSampler",
]
