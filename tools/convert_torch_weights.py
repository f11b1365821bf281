#!/usr/bin/env python
"""Convert a torch .pth (torchvision / reference mmdet) checkpoint into an
ioudet checkpoint (ref capability: mmcv load_checkpoint's torchvision://
scheme + tools/detectron2pytorch.py).

Modes:
  default  — backbone-only (torchvision ResNet .pth or a reference
             checkpoint's backbone.* subtree).
  --full   — full RetinaNet-family detector: backbone + FPN neck +
             retina head towers + retina_cls/reg(/iou).  Loadable via
             train's load_from / test's checkpoint argument.
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main():
    p = argparse.ArgumentParser()
    p.add_argument("pth", help="torch state_dict (.pth)")
    p.add_argument("out_dir")
    p.add_argument("--depth", type=int, default=50)
    p.add_argument("--backbone", default="resnet",
                   choices=["resnet", "hrnet", "ssd_vgg"],
                   help="backbone family for backbone-only conversion")
    p.add_argument("--full", action="store_true",
                   help="convert the full detector (backbone+neck+head)")
    p.add_argument("--num-laterals", type=int, default=3,
                   help="FPN lateral count (RetinaNet start_level=1 -> 3)")
    p.add_argument("--stacked-convs", type=int, default=4)
    args = p.parse_args()

    import torch
    from ioudet.apis.checkpoint import (convert_torch_hrnet,
                                        convert_torch_resnet,
                                        convert_torch_retinanet,
                                        convert_torch_ssd_vgg,
                                        save_checkpoint)

    sd = torch.load(args.pth, map_location="cpu", weights_only=False)
    if "state_dict" in sd:
        sd = sd["state_dict"]

    if args.full:
        params = convert_torch_retinanet(sd, depth=args.depth,
                                         num_laterals=args.num_laterals,
                                         stacked_convs=args.stacked_convs)
    else:
        sd = {k.replace("backbone.", ""): v for k, v in sd.items()}
        conv = {"resnet": lambda s: convert_torch_resnet(s, depth=args.depth),
                "hrnet": convert_torch_hrnet,
                "ssd_vgg": convert_torch_ssd_vgg}[args.backbone]
        params = {"backbone": conv(sd)}
    path = save_checkpoint(os.path.dirname(os.path.abspath(args.out_dir)) or ".",
                           os.path.basename(args.out_dir),
                           {"params": params},
                           meta=dict(source=args.pth, depth=args.depth,
                                     full=args.full))
    print(f"wrote {path}")


if __name__ == "__main__":
    main()
