from .bbox_overlaps import bbox_overlaps_np
from .class_names import (COCO_CLASSES, VOC_CLASSES, coco_classes, voc_classes,
                          get_classes)
from .coco_eval import (CocoEvaluator, coco_eval_results, print_coco_summary,
                        xyxy2xywh, iou_xywh)
from .mean_ap import eval_map, average_precision, tpfp_default, print_map_summary
from .recall import eval_recalls

__all__ = [
    "bbox_overlaps_np", "COCO_CLASSES", "VOC_CLASSES", "coco_classes",
    "voc_classes", "get_classes", "CocoEvaluator", "coco_eval_results",
    "print_coco_summary", "xyxy2xywh", "iou_xywh", "eval_map",
    "average_precision", "tpfp_default", "print_map_summary", "eval_recalls",
]
