from .checkpoint import (save_checkpoint, load_checkpoint, latest_checkpoint,
                         convert_torch_resnet)
from .train import (train_detector, make_train_step, init_train_state,
                    build_optimizer, make_lr_schedule, make_trainable_mask,
                    parse_losses, Runner)
from .inference import (init_detector, inference_detector, show_result,
                        DetectorHandle)
from .test import (single_device_test, multi_host_test, aug_test, tta_test,
                   make_eval_hook, make_proposal_recall_hook, make_predict_fn)
from .env import init_dist, set_random_seed, collect_env

__all__ = [
    "save_checkpoint", "load_checkpoint", "latest_checkpoint",
    "convert_torch_resnet", "train_detector", "make_train_step",
    "init_train_state", "build_optimizer", "make_lr_schedule",
    "make_trainable_mask", "parse_losses", "Runner", "init_detector",
    "inference_detector", "show_result", "DetectorHandle",
    "single_device_test", "multi_host_test", "aug_test", "make_eval_hook",
    "make_predict_fn",
]
