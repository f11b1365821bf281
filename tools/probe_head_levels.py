#!/usr/bin/env python
"""Per-level cost of the retina head towers at the flagship train canvas.

Decides whether ragged pyramid packing is worth building: if the small
levels (P5-P7, ~6% of head FLOPs) cost far more than their FLOP share,
packing all levels into one canvas pays; if they run near roofline,
it does not.  Times the IoU-aware head forward (and fwd+bwd) on:
  all5   : the real per-level loop (P3..P7)
  p3only : P3 alone (75% of head FLOPs)
  p3p4   : P3+P4 (94%)
Prints one JSON line.  Relay-safe chained timing (see bench.py).
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                ".."))

import jax
import jax.numpy as jnp
import numpy as np


def timed(fn, make_args, iters=8, chain=4):
    args_list = [make_args(i) for i in range(iters + chain)]
    carry = jnp.float32(0.0)
    for a in args_list[iters:]:
        carry = fn(carry, *a)
    float(carry)
    times = []
    for rep in range(iters // chain):
        t0 = time.perf_counter()
        for i in range(chain):
            carry = fn(carry, *args_list[rep * chain + i])
        float(carry)
        times.append((time.perf_counter() - t0) / chain)
    return float(np.median(times))


def main():
    from __graft_entry__ import FLAGSHIP, TRAIN_CFG, TEST_CFG
    from ioudet.models import build_detector

    batch = int(os.environ.get("PROF_BATCH", 8))
    canvas = tuple(int(v) for v in
                   os.environ.get("PROF_CANVAS", "832x1344").split("x"))
    cfg = dict(FLAGSHIP)
    cfg["dtype"] = "bfloat16"
    det = build_detector(cfg, TRAIN_CFG, TEST_CFG)
    head = det.bbox_head

    sizes = [(canvas[0] // s, canvas[1] // s) for s in head.anchor_strides]
    rng = np.random.default_rng(0)

    def feats(i, n):
        return [jnp.asarray(rng.normal(0, 1, (batch, h, w, 256)).astype(
            np.float32) + np.float32(i) * 1e-3, jnp.bfloat16)
            for h, w in sizes[:n]]

    params = head.init(jax.random.PRNGKey(0), feats(0, 5))["params"]

    out = {}
    for name, n in [("all5", 5), ("p3only", 1), ("p3p4", 2)]:
        @jax.jit
        def fwd(carry, *fs):
            outs = head.apply({"params": params},
                              [f + carry.astype(jnp.bfloat16) * 0
                               for f in fs])
            return sum(jnp.sum(o.astype(jnp.float32))
                       for grp in outs for o in grp)

        @jax.jit
        def fwdbwd(carry, *fs):
            def loss(fs_):
                outs = head.apply({"params": params}, fs_)
                return sum(jnp.sum(o.astype(jnp.float32))
                           for grp in outs for o in grp)
            val, g = jax.value_and_grad(loss)(
                [f + carry.astype(jnp.bfloat16) * 0 for f in fs])
            return val + sum(jnp.sum(x.astype(jnp.float32)) for x in g)

        batches = [tuple(feats(i, n)) for i in range(6)]
        out[f"ms_fwd_{name}"] = round(
            timed(fwd, lambda i: batches[i % len(batches)]) * 1e3, 2)
        out[f"ms_fwdbwd_{name}"] = round(
            timed(fwdbwd, lambda i: batches[i % len(batches)]) * 1e3, 2)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
