#!/usr/bin/env python
"""Convert a torch .pth (torchvision / reference mmdet) ResNet backbone into
an ioudet checkpoint for weight-parity testing (ref capability:
mmcv load_checkpoint's torchvision:// scheme + tools/detectron2pytorch.py)."""

import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main():
    p = argparse.ArgumentParser()
    p.add_argument("pth", help="torch state_dict (.pth)")
    p.add_argument("out_dir")
    p.add_argument("--depth", type=int, default=50)
    args = p.parse_args()

    import torch
    from ioudet.apis.checkpoint import convert_torch_resnet, save_checkpoint

    sd = torch.load(args.pth, map_location="cpu", weights_only=False)
    if "state_dict" in sd:
        sd = sd["state_dict"]
    sd = {k.replace("backbone.", ""): v for k, v in sd.items()}
    params = convert_torch_resnet(sd, depth=args.depth)
    path = save_checkpoint(os.path.dirname(os.path.abspath(args.out_dir)) or ".",
                           os.path.basename(args.out_dir),
                           {"params": {"backbone": params}},
                           meta=dict(source=args.pth, depth=args.depth))
    print(f"wrote {path}")


if __name__ == "__main__":
    main()
