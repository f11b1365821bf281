#!/usr/bin/env python
"""Upgrade checkpoints across framework versions (ref:
tools/upgrade_model_version.py).  Currently: re-stamps meta and validates the
state can be parsed; future schema migrations hook in here."""

import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main():
    p = argparse.ArgumentParser()
    p.add_argument("in_ckpt")
    p.add_argument("out_dir")
    args = p.parse_args()

    from ioudet.apis.checkpoint import load_checkpoint, save_checkpoint
    from ioudet.version import __version__

    state, meta = load_checkpoint(args.in_ckpt)
    meta["ioudet_version"] = __version__
    path = save_checkpoint(
        os.path.dirname(os.path.abspath(args.out_dir)) or ".",
        os.path.basename(args.out_dir.rstrip("/")), state, meta)
    print(f"upgraded -> {path} (version {__version__})")


if __name__ == "__main__":
    main()
