from .anchor import (AnchorGenerator, AnchorTargets, anchor_target,
                     anchor_target_single, anchor_inside_flags, images_to_levels)
from .bbox import (bbox_overlaps, bbox2delta, delta2bbox, bbox_flip,
                   bbox_mapping, bbox_mapping_back, distance2bbox, bbox2result,
                   MaxIoUAssigner, assign_max_iou, PseudoSampler)
from .post_processing import multiclass_nms, merge_aug_bboxes, merge_aug_scores
from .evaluation import (CocoEvaluator, coco_eval_results, eval_map,
                         eval_recalls, get_classes)

__all__ = [
    "AnchorGenerator", "AnchorTargets", "anchor_target", "anchor_target_single",
    "anchor_inside_flags", "images_to_levels",
    "bbox_overlaps", "bbox2delta", "delta2bbox", "bbox_flip", "bbox_mapping",
    "bbox_mapping_back", "distance2bbox", "bbox2result",
    "MaxIoUAssigner", "assign_max_iou", "PseudoSampler",
    "multiclass_nms", "merge_aug_bboxes", "merge_aug_scores",
    "CocoEvaluator", "coco_eval_results", "eval_map", "eval_recalls",
    "get_classes",
]
