from .utils import weight_reduce_loss, weighted_loss, reduce_loss
from .focal_loss import FocalLoss, sigmoid_focal_loss, sigmoid_focal_loss_with_logits
from .smooth_l1_loss import SmoothL1Loss, L1Loss, smooth_l1_loss
from .cross_entropy_loss import (CrossEntropyLoss, cross_entropy,
                                 binary_cross_entropy,
                                 binary_cross_entropy_with_logits)
from .iou_loss import IoULoss, BoundedIoULoss, GIoULoss, iou_loss
from .ghm_loss import GHMC, GHMR
from .balanced_l1_loss import BalancedL1Loss, balanced_l1_loss
from .mse_loss import MSELoss
from .accuracy import accuracy

__all__ = [
    "weight_reduce_loss", "weighted_loss", "reduce_loss",
    "FocalLoss", "sigmoid_focal_loss", "sigmoid_focal_loss_with_logits",
    "SmoothL1Loss", "L1Loss", "smooth_l1_loss",
    "CrossEntropyLoss", "cross_entropy", "binary_cross_entropy",
    "binary_cross_entropy_with_logits",
    "IoULoss", "BoundedIoULoss", "GIoULoss", "iou_loss",
    "GHMC", "GHMR", "BalancedL1Loss", "balanced_l1_loss", "MSELoss", "accuracy",
]
