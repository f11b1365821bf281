#!/usr/bin/env python
"""Eval-side per-layer roofline (VERDICT r4 next #1 — the eval analog of the
round-4 train-step roofline in docs/MODEL_ZOO.md).

Enumerates every conv shape group in the IoU-aware R-50-FPN inference
program at the bench canvas (832x1344, batch PROF_BATCH=16), measures each
group's one-instance time on the real chip (REPEAT reps chained inside one
program; dependent carry; scalar fetch — the relay-safe protocol from
bench.py), and compares group totals against each group's own roofline
floor:

    floor = max(FLOPs / PEAK_TFLOPS, bytes_moved / HBM_GBPS)

PEAK is the measured 205.6 TF/s bf16 conv rate from tools/probe_int8_conv.py
(not the nominal 197 — we hold layers to what this toolchain demonstrably
reaches), HBM_GBPS the v5e nominal 819 GB/s.  bytes_moved counts input +
output activations once each (weights are negligible at batch 16 except the
2048-channel C5 layers, counted too).

Modes: bf16 (exact) and int8 (static-scale w8a8 with requant glue — the
production bench path).  Prints one JSON line per (group, mode) and a final
summary table; paste into docs/MODEL_ZOO.md.
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

PEAK_TFLOPS = 205.6
HBM_GBPS = 819.0
REPEAT = 32  # chained in-program; ~27 ms dispatch / (chain*REPEAT) ≈ 0.4 ms

# (label, count, H, W, Cin, Cout, k, stride) at canvas 832x1344
# ResNet-50: stem 416x672 out; C2 208x336, C3 104x168, C4 52x84, C5 26x42.
SPECS = [
    ("stem_7x7s2_3-64", 1, 832, 1344, 3, 64, 7, 2),
    # stage1 (C2 208x336)
    ("c2_1x1_64-64", 1, 208, 336, 64, 64, 1, 1),
    ("c2_3x3_64-64", 3, 208, 336, 64, 64, 3, 1),
    ("c2_1x1_64-256", 3, 208, 336, 64, 256, 1, 1),
    ("c2_1x1_256-64", 2, 208, 336, 256, 64, 1, 1),
    ("c2_ds_1x1_64-256", 1, 208, 336, 64, 256, 1, 1),
    # stage2 (C3 104x168); first block's 3x3 strides from 208x336
    ("c3_1x1_256-128", 1, 208, 336, 256, 128, 1, 1),
    ("c3_3x3s2_128-128", 1, 208, 336, 128, 128, 3, 2),
    ("c3_ds_1x1s2_256-512", 1, 208, 336, 256, 512, 1, 2),
    ("c3_1x1_512-128", 3, 104, 168, 512, 128, 1, 1),
    ("c3_3x3_128-128", 3, 104, 168, 128, 128, 3, 1),
    ("c3_1x1_128-512", 4, 104, 168, 128, 512, 1, 1),
    # stage3 (C4 52x84)
    ("c4_1x1_512-256", 1, 104, 168, 512, 256, 1, 1),
    ("c4_3x3s2_256-256", 1, 104, 168, 256, 256, 3, 2),
    ("c4_ds_1x1s2_512-1024", 1, 104, 168, 512, 1024, 1, 2),
    ("c4_1x1_1024-256", 5, 52, 84, 1024, 256, 1, 1),
    ("c4_3x3_256-256", 5, 52, 84, 256, 256, 3, 1),
    ("c4_1x1_256-1024", 6, 52, 84, 256, 1024, 1, 1),
    # stage4 (C5 26x42)
    ("c5_1x1_1024-512", 1, 52, 84, 1024, 512, 1, 1),
    ("c5_3x3s2_512-512", 1, 52, 84, 512, 512, 3, 2),
    ("c5_ds_1x1s2_1024-2048", 1, 52, 84, 1024, 2048, 1, 2),
    ("c5_1x1_2048-512", 2, 26, 42, 2048, 512, 1, 1),
    ("c5_3x3_512-512", 2, 26, 42, 512, 512, 3, 1),
    ("c5_1x1_512-2048", 3, 26, 42, 512, 2048, 1, 1),
    # FPN: laterals + 3x3 outs (P3..P5) + extra P6/P7
    ("fpn_lat_1x1_512-256", 1, 104, 168, 512, 256, 1, 1),
    ("fpn_lat_1x1_1024-256", 1, 52, 84, 1024, 256, 1, 1),
    ("fpn_lat_1x1_2048-256", 1, 26, 42, 2048, 256, 1, 1),
    ("fpn_out_3x3_P3", 1, 104, 168, 256, 256, 3, 1),
    ("fpn_out_3x3_P4", 1, 52, 84, 256, 256, 3, 1),
    ("fpn_out_3x3_P5", 1, 26, 42, 256, 256, 3, 1),
    ("fpn_p6_3x3s2_2048-256", 1, 26, 42, 2048, 256, 3, 2),
    ("fpn_p7_3x3s2_256-256", 1, 13, 21, 256, 256, 3, 2),
    # head towers: 8 convs/level (4 cls + 4 reg), shared weights across levels
    ("head_tower_P3", 8, 104, 168, 256, 256, 3, 1),
    ("head_tower_P4", 8, 52, 84, 256, 256, 3, 1),
    ("head_tower_P5", 8, 26, 42, 256, 256, 3, 1),
    ("head_tower_P6", 8, 13, 21, 256, 256, 3, 1),
    ("head_tower_P7", 8, 7, 11, 256, 256, 3, 1),
    # prediction convs (720/36/9 out-channels — lane-misaligned)
    ("head_cls_P3_256-720", 1, 104, 168, 256, 720, 3, 1),
    ("head_cls_P4_256-720", 1, 52, 84, 256, 720, 3, 1),
    ("head_cls_P5-7_256-720", 3, 26, 42, 256, 720, 3, 1),
    ("head_reg_P3_256-36", 1, 104, 168, 256, 36, 3, 1),
    ("head_reg_P4-7_256-36", 4, 52, 84, 256, 36, 3, 1),
    ("head_iou_P3_256-9", 1, 104, 168, 256, 9, 3, 1),
    ("head_iou_P4-7_256-9", 4, 52, 84, 256, 9, 3, 1),
]


def timed(fn, base, kern, iters=4, chain=2):
    """No per-iteration host->device transfer (relay transfers dominate
    otherwise): device-resident base + a varying scalar salt."""
    carry = jnp.float32(0.0)
    for i in range(2):
        carry = fn(carry, base, kern, jnp.float32(100 + i))
    float(carry)
    times = []
    for rep in range(iters // chain):
        t0 = time.perf_counter()
        for i in range(chain):
            carry = fn(carry, base, kern, jnp.float32(rep * chain + i))
        float(carry)
        times.append((time.perf_counter() - t0) / chain)
    return float(np.median(times))


def conv_program(h, w, cin, cout, k, stride, mode):
    pad = "SAME" if stride == 1 else [((k - 1) // 2, (k - 1) // 2)] * 2

    @jax.jit
    def run(carry, x, kern, salt):
        # The serial dependence is threaded through the (tiny) KERNEL, not
        # the activation: rep i+1's kernel = kern + sum(o_i) * 1e-30.  A
        # full-tensor activation chain (y = x + s*1e-30) costs an extra
        # elementwise pass over x per rep (~0.5 ms on the big layers — it
        # swamped every sub-ms layer in the first version); the kernel add
        # is k*k*cin*cout elements.  The full reduce of o forces every
        # output element (DCE-proof), and usually fuses into the conv's
        # epilogue.  (1e-30, not 0.0: a *0 fold would sever the chain.)
        k = kern + (carry * 1e-30 + salt * 1e-32).astype(kern.dtype)
        s = jnp.float32(0.0)
        for _ in range(REPEAT):
            if mode == "bf16":
                o = jax.lax.conv_general_dilated(
                    x, k, (stride, stride), pad,
                    dimension_numbers=("NHWC", "HWIO", "NHWC"))
            else:  # int8 static-scale w8a8 with requant glue
                # xs depends on the chain so the per-rep activation-quant
                # pass (a real per-layer cost of the production int8 path)
                # cannot be loop-hoisted
                xs = jnp.float32(0.05) + s * 1e-30
                q = jnp.clip(jnp.round(x.astype(jnp.float32) / xs), -127,
                             127).astype(jnp.int8)
                ws = jnp.float32(0.01)
                kq = jnp.clip(jnp.round(k.astype(jnp.float32) / ws), -127,
                              127).astype(jnp.int8)
                o32 = jax.lax.conv_general_dilated(
                    q, kq, (stride, stride), pad,
                    dimension_numbers=("NHWC", "HWIO", "NHWC"),
                    preferred_element_type=jnp.int32)
                o = (o32.astype(jnp.float32) * (xs * ws)).astype(jnp.bfloat16)
            s = jnp.sum(o, dtype=jnp.float32)
            k = kern + (s * 1e-30).astype(kern.dtype)
        return s

    return run


def main():
    batch = int(os.environ.get("PROF_BATCH", 16))
    modes = os.environ.get("PROF_MODES", "bf16,int8").split(",")
    only = os.environ.get("PROF_ONLY")  # substring filter
    rng = np.random.default_rng(0)
    rows = []
    for (label, count, h, w, cin, cout, k, stride) in SPECS:
        if only and only not in label:
            continue
        oh, ow = (h + stride - 1) // stride, (w + stride - 1) // stride
        flops = 2.0 * batch * oh * ow * cin * cout * k * k
        act_bytes = 2.0 * batch * (h * w * cin + oh * ow * cout)
        w_bytes = 2.0 * k * k * cin * cout
        floor_ms = max(flops / (PEAK_TFLOPS * 1e12),
                       (act_bytes + w_bytes) / (HBM_GBPS * 1e9)) * 1e3
        base = jnp.asarray(rng.normal(0, 1, (batch, h, w, cin)).astype(
            np.float32)).astype(jnp.bfloat16)
        kern = jnp.asarray(rng.normal(0, 0.01, (k, k, cin, cout)).astype(
            np.float32)).astype(jnp.bfloat16)
        row = dict(label=label, count=count, floor_ms=round(floor_ms, 3))
        for mode in modes:
            fn = conv_program(h, w, cin, cout, k, stride, mode)
            dt = timed(fn, base, kern) / REPEAT
            row[f"{mode}_ms"] = round(dt * 1e3, 3)
            row[f"{mode}_x_floor"] = round(dt * 1e3 / floor_ms, 2)
        rows.append(row)
        print(json.dumps(row), flush=True)

    for mode in modes:
        tot = sum(r[f"{mode}_ms"] * r["count"] for r in rows)
        tot_floor = sum(r["floor_ms"] * r["count"] for r in rows)
        print(json.dumps({"mode": mode, "total_ms": round(tot, 1),
                          "total_floor_ms": round(tot_floor, 1),
                          "x_floor": round(tot / tot_floor, 2)}))


if __name__ == "__main__":
    main()
