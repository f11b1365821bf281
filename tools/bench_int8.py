#!/usr/bin/env python
"""bf16 vs int8 (w8a8) inference comparison on the real chip, in ONE
process (VERDICT r2 item 1: measure BENCH_QUANT=int8 on-chip).

bench.py stages every iteration's input from the host, which costs minutes
of relay transfer per run; here ONE base image batch is staged and the
unique per-iteration inputs are DERIVED ON DEVICE (base + k*eps) — still
distinct buffers/args (no relay result memoization), ~1 transfer total.
Timing uses the same serial carry-chain + amortized scalar fetch as
bench.py (see its comments).

Prints one JSON line with both modes' img/s and the ratio.
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


def measure(predict, params, imgs, img_shape, scale, pad_shape,
            iters, chain, batch):
    carry = jnp.float32(0.0)
    # warmup/compile
    out = predict(params, imgs[-1], img_shape, scale, pad_shape, carry)
    float(out[2])
    times = []
    for rep in range(max(1, iters // chain)):
        t0 = time.perf_counter()
        for i in range(chain):
            d, l, carry = predict(params, imgs[rep * chain + i],
                                  img_shape, scale, pad_shape, carry)
        float(carry)
        times.append((time.perf_counter() - t0) / chain)
    dt = float(np.median(times))
    implied_tflops = 0.52 * batch / dt
    assert implied_tflops < 500, "implausible rate — execution elided"
    return batch / dt


def main():
    from ioudet.models import build_detector
    from ioudet.ops.quant import quantize_calls
    from __graft_entry__ import FLAGSHIP, TEST_CFG, TRAIN_CFG

    batch = int(os.environ.get("BENCH_BATCH", 16))
    iters = int(os.environ.get("BENCH_ITERS", 8))
    chain = int(os.environ.get("BENCH_CHAIN", 4))
    canvas = (832, 1344)

    cfg = dict(FLAGSHIP)
    cfg["dtype"] = "bfloat16"
    det = build_detector(cfg, TRAIN_CFG, TEST_CFG)
    img0 = jnp.zeros((1,) + canvas + (3,), jnp.float32)
    params = det.init(jax.random.PRNGKey(0), img0)["params"]

    rng = np.random.default_rng(os.getpid() ^ time.time_ns())
    base = jnp.asarray(rng.standard_normal(
        (batch,) + canvas + (3,), dtype=np.float32))  # ONE staged transfer

    @jax.jit
    def derive(base, k):
        return base + k * 1e-3

    imgs = [derive(base, jnp.float32(k)) for k in range(iters + 2)]
    jax.block_until_ready(imgs[-1])
    img_shape = jnp.tile(jnp.asarray([[800, 1333]], jnp.int32), (batch, 1))
    pad_shape = jnp.tile(jnp.asarray([[832, 1344]], jnp.int32), (batch, 1))
    scale = jnp.ones((batch,), jnp.float32)

    calib_scales = None
    modes = os.environ.get("BENCH_MODES",
                           "bf16,int8,int8_static").split(",")
    if "int8_calibrated" in modes:
        # one-off eager calibration pass on the HOST CPU (eager through the
        # TPU relay would be per-op round trips); per-layer scales land as
        # compile-time constants in the TPU program
        from ioudet.ops.quant import calibrate
        cpu = jax.devices("cpu")[0]
        with jax.default_device(cpu):
            params_c = jax.device_put(params, cpu)
            small = jax.device_put(
                np.asarray(rng.standard_normal((1, 416, 672, 3)),
                           np.float32), cpu)
            calib_scales = calibrate(
                lambda x: det.apply({"params": params_c}, x), [small])
        print(f"calibrated {len(calib_scales)} conv scales", flush=True)

    def make_predict(mode):
        @jax.jit
        def predict(params, img, img_shape, scale_factor, pad_shape,
                    carry=jnp.float32(0.0)):
            import contextlib
            if mode == "int8":
                ctx = quantize_calls()
            elif mode == "int8_static":
                # single global static scale: perf upper bound for the
                # no-absmax path (accuracy-meaningless; see calibrated)
                ctx = quantize_calls(act_scale=0.05)
            elif mode == "int8_calibrated":
                ctx = quantize_calls(act_scale=calib_scales)
            else:
                ctx = contextlib.nullcontext()
            with ctx:
                dets, labels = det.apply(
                    {"params": params}, img + carry * 1e-30, img_shape,
                    scale_factor, pad_shape, method=det.simple_test)
            return dets, labels, dets[0, 0, 4]

        return predict

    out = {"batch": batch}
    for mode in modes:
        out[f"{mode}_img_per_sec"] = round(
            measure(make_predict(mode), params, imgs, img_shape, scale,
                    pad_shape, iters, chain, batch), 2)
    if "bf16_img_per_sec" in out and "int8_img_per_sec" in out:
        out["int8_over_bf16"] = round(
            out["int8_img_per_sec"] / out["bf16_img_per_sec"], 3)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
