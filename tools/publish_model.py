#!/usr/bin/env python
"""Strip optimizer state from a checkpoint for release and stamp a content
hash (ref: tools/publish_model.py)."""

import argparse
import hashlib
import os
import shutil
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main():
    p = argparse.ArgumentParser()
    p.add_argument("in_ckpt", help="checkpoint directory")
    p.add_argument("out_ckpt", help="output directory (hash appended)")
    args = p.parse_args()

    from ioudet.apis.checkpoint import load_checkpoint, save_checkpoint

    state, meta = load_checkpoint(args.in_ckpt)
    published = {"params": state["params"] if "params" in state else state}
    out_dir = os.path.dirname(os.path.abspath(args.out_ckpt)) or "."
    name = os.path.basename(args.out_ckpt.rstrip("/"))
    path = save_checkpoint(out_dir, name, published, meta)
    with open(os.path.join(path, "state.msgpack"), "rb") as f:
        sha = hashlib.sha256(f.read()).hexdigest()[:8]
    final = os.path.join(out_dir, f"{name}-{sha}")
    shutil.move(path, final)
    print(f"published {final}")


if __name__ == "__main__":
    main()
