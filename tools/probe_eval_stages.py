#!/usr/bin/env python
"""Eval-pipeline stage timing on the real chip (VERDICT r4 next #1).

Times three cumulative programs at the exact bench configuration (int8
calibrated by default, batch BENCH_BATCH, 832x1344, production TEST_CFG):

  net    : backbone -> FPN -> head (returns a scalar probe of the outputs)
  decode : net + per-level top-k + delta2bbox + IoU rescoring
  full   : decode + batched multiclass NMS (= simple_test)

Differences attribute the tail: decode-net = candidate selection + decode,
full-decode = NMS.  Relay-safe: device-resident base image + scalar salt,
serial carry chain, scalar fetch per chain.  Prints one JSON line per stage.

Env: BENCH_QUANT=none for bf16, PROBE_CLASS_TOPK / PROBE_PRE_NMS_TOTAL to
probe tail-pruning variants, BENCH_BATCH (default 16).
"""

import contextlib
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np


def timed(fn, args, iters=8, chain=4):
    carry = jnp.float32(0.0)
    for i in range(2):
        carry = fn(carry, jnp.float32(100 + i), *args)
    float(carry)
    times = []
    for rep in range(iters // chain):
        t0 = time.perf_counter()
        for i in range(chain):
            carry = fn(carry, jnp.float32(rep * chain + i), *args)
        float(carry)
        times.append((time.perf_counter() - t0) / chain)
    return float(np.median(times))


def main():
    from __graft_entry__ import FLAGSHIP, TEST_CFG, TRAIN_CFG
    from ioudet.models import build_detector

    batch = int(os.environ.get("BENCH_BATCH", 16))
    canvas = (832, 1344)
    cfg = dict(FLAGSHIP)
    cfg["dtype"] = "bfloat16"
    test_cfg = dict(TEST_CFG)
    if os.environ.get("PROBE_CLASS_TOPK"):
        v = os.environ["PROBE_CLASS_TOPK"]
        test_cfg["class_topk"] = None if v == "none" else int(v)
    if os.environ.get("PROBE_PRE_NMS_TOTAL"):
        test_cfg["pre_nms_total"] = int(os.environ["PROBE_PRE_NMS_TOTAL"])
    if os.environ.get("PROBE_NMS_PRE"):
        test_cfg["nms_pre"] = int(os.environ["PROBE_NMS_PRE"])
    if os.environ.get("PROBE_EXACT_SELECT"):
        test_cfg["exact_select"] = os.environ["PROBE_EXACT_SELECT"]
    det = build_detector(cfg, TRAIN_CFG, test_cfg)

    img0 = jnp.zeros((1,) + canvas + (3,), jnp.float32)
    variables = det.init(jax.random.PRNGKey(0), img0)
    params = variables["params"]

    quant_mode = os.environ.get("BENCH_QUANT", "int8_calibrated")
    act_scales = None
    if quant_mode == "int8_calibrated":
        from ioudet.ops.quant import calibrate
        cpu = jax.devices("cpu")[0]
        rng = np.random.default_rng(0)
        with jax.default_device(cpu):
            params_c = jax.device_put(params, cpu)
            small = jax.device_put(np.asarray(
                rng.standard_normal((1, 416, 672, 3)), np.float32), cpu)
            act_scales = calibrate(
                lambda x: det.apply({"params": params_c}, x), [small])
    quant = quant_mode == "int8_calibrated"

    def qctx():
        from ioudet.ops.quant import quantize_calls
        return quantize_calls(act_scale=act_scales) if quant else \
            contextlib.nullcontext()

    img_shape = jnp.tile(jnp.asarray([[800, 1333]], jnp.int32), (batch, 1))
    pad_shape = jnp.tile(jnp.asarray([[832, 1344]], jnp.int32), (batch, 1))
    scale = jnp.ones((batch,), jnp.float32)
    rng = np.random.default_rng(0)
    base = jnp.asarray(rng.standard_normal(
        (batch,) + canvas + (3,)).astype(np.float32))

    @jax.jit
    def run_net(carry, salt, img):
        with qctx():
            outs = det.apply({"params": params}, img + carry * 1e-30 +
                             salt * 1e-6)
        leaves = jax.tree.leaves(outs)
        # full reduce of EVERY output: a sliced or zero-multiplied probe
        # lets XLA dead-code-eliminate entire prediction convs (first run
        # of this tool measured net > full because of exactly that)
        return sum(jnp.sum(l.astype(jnp.float32)) for l in leaves)

    @jax.jit
    def run_decode(carry, salt, img):
        with qctx():
            outs = det.apply({"params": params}, img + carry * 1e-30 +
                             salt * 1e-6)
        boxes, scores = det.bbox_head.decode_candidates(
            *outs, img_shape, test_cfg)
        return jnp.sum(boxes[:, :8].astype(jnp.float32)) + \
            jnp.sum(scores[:, :8].astype(jnp.float32))

    @jax.jit
    def run_full(carry, salt, img):
        with qctx():
            dets, labels = det.apply(
                {"params": params}, img + carry * 1e-30 + salt * 1e-6,
                img_shape, scale, pad_shape, method=det.simple_test)
        return jnp.sum(dets[:, :8].astype(jnp.float32))

    stages = os.environ.get("PROBE_STAGES", "net,decode,full").split(",")
    rows = {}
    for tag, fn in (("net", run_net), ("decode", run_decode),
                    ("full", run_full)):
        if tag not in stages:
            continue
        dt = timed(fn, (base,))
        rows[tag] = dt * 1e3
        print(json.dumps({tag + "_ms": round(dt * 1e3, 2),
                          "img_per_s": round(batch / dt, 1)}), flush=True)
    summary = {
        "quant": quant_mode, "batch": batch,
        "class_topk": test_cfg.get("class_topk"),
        "pre_nms_total": test_cfg.get("pre_nms_total", 2000),
        "nms_pre": test_cfg.get("nms_pre"),
        "exact_select": test_cfg.get("exact_select", "threshold")}
    if "decode" in rows and "net" in rows:
        summary["decode_minus_net_ms"] = round(rows["decode"] - rows["net"], 2)
    if "full" in rows and "decode" in rows:
        summary["nms_ms"] = round(rows["full"] - rows["decode"], 2)
    print(json.dumps(summary))


if __name__ == "__main__":
    main()
