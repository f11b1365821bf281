#!/usr/bin/env python
"""Training CLI (ref: tools/train.py).

Usage: python tools/train.py configs/iou_aware_retinanet_r50_fpn_1x.py \
           [--work_dir D] [--resume_from CKPT] [--validate] [--seed N]

Multi-chip: there is no torch.distributed.launch analog — a single process
drives the whole local mesh (GSPMD); multi-host runs launch one process per
host with jax.distributed auto-init (ref launchers dist_train.sh/slurm_train.sh
are replaced by tools/dist_train.sh which just execs this once per host).
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def parse_args():
    p = argparse.ArgumentParser(description="Train a detector")
    p.add_argument("config")
    p.add_argument("--work_dir", default=None)
    p.add_argument("--resume_from", default=None)
    p.add_argument("--load_from", default=None,
                   help="load weights only (e.g. a converted backbone)")
    p.add_argument("--validate", action="store_true")
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--n-devices", type=int, default=None,
                   help="limit the data-parallel mesh size")
    p.add_argument("--autoscale-lr", action="store_true",
                   help="lr ∝ total batch / 16 (ref: --autoscale-lr)")
    p.add_argument("--dtype", default=None, choices=[None, "bfloat16", "float32"])
    return p.parse_args()


def main():
    args = parse_args()
    import jax
    from ioudet import Config
    from ioudet.apis import train_detector
    from ioudet.data import build_dataset
    from ioudet.models import build_detector
    from ioudet.utils.logging import get_root_logger

    cfg = Config.fromfile(args.config)
    work_dir = args.work_dir or cfg.get("work_dir", "./work_dirs/default")
    os.makedirs(work_dir, exist_ok=True)
    with open(os.path.join(work_dir, "config.py"), "w") as f:
        f.write(cfg.text)
    logger = get_root_logger(log_file=os.path.join(work_dir, "train.log"))
    logger.info(f"devices: {jax.devices()}")

    model_cfg = dict(cfg.model)
    if args.dtype:
        model_cfg["dtype"] = args.dtype
    if args.autoscale_lr:
        n_dev = args.n_devices or jax.device_count()
        total_batch = cfg.data["imgs_per_gpu"] * n_dev
        cfg.optimizer["lr"] = cfg.optimizer["lr"] * total_batch / 16.0

    detector = build_detector(model_cfg, cfg.get("train_cfg"),
                              cfg.get("test_cfg"))
    dataset = build_dataset(cfg.data["train"])
    val_dataset = None
    if args.validate and "val" in cfg.data:
        val_dataset = build_dataset(cfg.data["val"])
    train_detector(detector, dataset, cfg, work_dir,
                   validate=args.validate, val_dataset=val_dataset,
                   resume_from=args.resume_from, load_from=args.load_from,
                   seed=args.seed, n_devices=args.n_devices)


if __name__ == "__main__":
    main()
