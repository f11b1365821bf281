#!/usr/bin/env python
"""Convert Detectron (caffe2) ResNet weights to an ioudet backbone tree
(ref: tools/detectron2pytorch.py — the reference converts detectron pkl to
a torch state_dict; here the target is the flax param tree directly, saved
as a partial checkpoint loadable via cfg.load_from).

Detectron naming (caffe2):
  conv1_w, res_conv1_bn_{s,b} (+ running stats in the test blobs),
  res{S}_{B}_branch2{a,b,c}_w / _bn_{s,b},
  res{S}_{B}_branch1_w / _bn_{s,b}   (projection shortcut)
with S in 2..5 -> layer{S-1}, branch2a/b/c -> conv1/2/3, branch1 ->
downsample.  Detectron BN blobs are affine-only (already-folded running
stats), matching our FrozenBN with mean=0/var=1 when the stats blobs are
absent.

Usage:
  python tools/detectron2ioudet.py in.pkl out_dir --depth 50
"""

import argparse
import os
import pickle
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                ".."))

STAGE_BLOCKS = {50: (3, 4, 6, 3), 101: (3, 4, 23, 3), 152: (3, 8, 36, 3)}


def _conv(w):
    # caffe2 OIHW -> flax HWIO
    return np.ascontiguousarray(np.transpose(np.asarray(w), (2, 3, 1, 0)))


def _bn(blobs, prefix, features):
    s = np.asarray(blobs[prefix + "_s"], np.float32)
    b = np.asarray(blobs[prefix + "_b"], np.float32)
    mean = np.asarray(blobs.get(prefix + "_rm",
                                np.zeros(features, np.float32)))
    var = np.asarray(blobs.get(prefix + "_riv", None)) if \
        (prefix + "_riv") in blobs else None
    if var is not None:  # detectron stores running INVERSE variance
        var = 1.0 / np.maximum(var, 1e-12) - 1e-5
    else:
        var = np.ones(features, np.float32)
    return dict(scale=s, bias=b, mean=mean, var=var.astype(np.float32))


def convert_detectron_resnet(blobs: dict, depth: int = 50) -> dict:
    out = {"conv1": {"kernel": _conv(blobs["conv1_w"])},
           "bn1": _bn(blobs, "res_conv1_bn", 64)}
    for si, n_blocks in enumerate(STAGE_BLOCKS[depth]):
        s = si + 2  # detectron stage index
        for b in range(n_blocks):
            blk = {}
            for letter, name in (("a", "conv1"), ("b", "conv2"),
                                 ("c", "conv3")):
                w = blobs[f"res{s}_{b}_branch2{letter}_w"]
                blk[name] = {"kernel": _conv(w)}
                blk[f"bn{'abc'.index(letter) + 1}"] = _bn(
                    blobs, f"res{s}_{b}_branch2{letter}_bn", w.shape[0])
            if f"res{s}_{b}_branch1_w" in blobs:
                w = blobs[f"res{s}_{b}_branch1_w"]
                blk["downsample_conv"] = {"kernel": _conv(w)}
                blk["downsample_bn"] = _bn(blobs, f"res{s}_{b}_branch1_bn",
                                           w.shape[0])
            out[f"layer{si + 1}_{b}"] = blk
    return out


def main():
    p = argparse.ArgumentParser()
    p.add_argument("src")
    p.add_argument("dst")
    p.add_argument("--depth", type=int, default=50)
    args = p.parse_args()
    with open(args.src, "rb") as f:
        data = pickle.load(f, encoding="latin1")
    blobs = data.get("blobs", data)
    tree = dict(backbone=convert_detectron_resnet(blobs, args.depth))
    from ioudet.apis.checkpoint import save_checkpoint
    path = save_checkpoint(args.dst, "detectron_backbone",
                           dict(params=tree),
                           dict(source=os.path.basename(args.src),
                                depth=args.depth))
    print(f"saved {path}")


if __name__ == "__main__":
    main()
