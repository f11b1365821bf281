#!/usr/bin/env python
"""Root-cause probe for the int8 end-to-end wash (VERDICT r2 item 1
evidence): times ONE detection-shaped conv in three forms —
  bf16      : bf16 x bf16 -> bf16 (the production path)
  int8_raw  : int8 x int8 -> int32 MXU conv only (inputs pre-quantized)
  int8_e2e  : quantize(absmax) -> int8 conv -> dequant + bias (what the
              dynamic w8a8 interceptor actually executes per call)
and prints the implied TOPS for each + whether the compiled HLO keeps the
s8 operands (i.e. the int8 MXU path is real, not an upcast).
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


def timed(fn, args_list, iters=8):
    """Serial carry-chain timing (relay memoizes identical calls AND elides
    unfetched results — iteration i's input must depend on i-1's output and
    a scalar must be fetched; see bench.py)."""
    carry = jnp.float32(0.0)
    out = fn(*args_list[-1], carry)
    carry = out
    float(carry)
    times = []
    for rep in range(4):
        t0 = time.perf_counter()
        for i in range(2):
            carry = fn(*args_list[(rep * 2 + i) % len(args_list)], carry)
        float(carry)
        times.append((time.perf_counter() - t0) / 2)
    return float(np.median(times))


REPEAT = 16  # convs chained INSIDE the program: amortizes the ~27 ms relay
#              dispatch+fetch latency that would otherwise dominate a
#              single ~3 ms conv


def main():
    B, H, W, C = 16, 104, 168, 256
    K = 256
    flops = 2 * B * H * W * C * K * 9 * REPEAT

    rng = np.random.default_rng(0)
    xs = [jnp.asarray(rng.standard_normal((B, H, W, C), dtype=np.float32))
          for _ in range(4)]
    k = jnp.asarray(rng.standard_normal((3, 3, C, K)).astype(np.float32))

    def _conv(x, k, **kw):
        return jax.lax.conv_general_dilated(
            x, k, (1, 1), "SAME",
            dimension_numbers=("NHWC", "HWIO", "NHWC"), **kw)

    @jax.jit
    def conv_bf16(x, k, carry):
        y = (x + carry * 1e-30).astype(jnp.bfloat16)
        kb = (k * 0.02).astype(jnp.bfloat16)  # keep activations bounded
        for _ in range(REPEAT):
            y = _conv(y, kb)
        return y[0, 0, 0, 0].astype(jnp.float32)

    @jax.jit
    def to_int8(x):
        s = jnp.max(jnp.abs(x)) / 127.0
        return jnp.clip(jnp.round(x / s), -127, 127).astype(jnp.int8)

    xq = [to_int8(x) for x in xs]
    kq = to_int8(k)
    jax.block_until_ready(xq[-1])

    @jax.jit
    def conv_int8_raw(x, k, carry):
        # quantized-domain pipeline: int8 conv -> int32 -> constant-shift
        # requant back to int8 (the cheapest possible inter-conv glue)
        y = (x.astype(jnp.int32) + (carry * 0).astype(jnp.int32)).astype(
            jnp.int8)
        for _ in range(REPEAT):
            y32 = _conv(y, k, preferred_element_type=jnp.int32)
            y = jnp.clip(y32 // 512, -127, 127).astype(jnp.int8)
        return y[0, 0, 0, 0].astype(jnp.float32)

    from ioudet.ops.quant import _quantize_tensor, _quantize_weight

    @jax.jit
    def conv_int8_e2e(x, k, carry):
        # what the dynamic w8a8 interceptor does per conv: absmax quantize,
        # int8 conv, fp dequant
        y = (x + carry * 1e-30)
        kq, sw = _quantize_weight(k * 0.02)
        for _ in range(REPEAT):
            yq, sx = _quantize_tensor(y)
            y32 = _conv(yq, kq, preferred_element_type=jnp.int32)
            y = (y32.astype(jnp.float32) * (sx * sw)).astype(jnp.bfloat16)
        return y[0, 0, 0, 0].astype(jnp.float32)

    @jax.jit
    def conv_int8_static(x, k, carry):
        # static-scale path: constant-scale quantize (no absmax reduce)
        y = (x + carry * 1e-30)
        kq, sw = _quantize_weight(k * 0.02)
        for _ in range(REPEAT):
            yq = jnp.clip(jnp.round(y / 0.05), -127, 127).astype(jnp.int8)
            y32 = _conv(yq, kq, preferred_element_type=jnp.int32)
            y = (y32.astype(jnp.float32) * (0.05 * sw)).astype(jnp.bfloat16)
        return y[0, 0, 0, 0].astype(jnp.float32)

    hlo = jax.jit(conv_int8_raw).lower(
        xq[0], kq, jnp.float32(0.0)).compile().as_text()
    s8_conv = ("s8" in hlo and "convolution" in hlo)

    t_bf16 = timed(conv_bf16, [(x, k) for x in xs])
    t_raw = timed(conv_int8_raw, [(x, kq) for x in xq])
    t_e2e = timed(conv_int8_e2e, [(x, k) for x in xs])
    t_stat = timed(conv_int8_static, [(x, k) for x in xs])
    print(json.dumps({
        "bf16_tops": round(flops / t_bf16 / 1e12, 1),
        "int8_raw_tops": round(flops / t_raw / 1e12, 1),
        "int8_dynamic_tops": round(flops / t_e2e / 1e12, 1),
        "int8_static_tops": round(flops / t_stat / 1e12, 1),
        "hlo_keeps_s8_conv": bool(s8_conv),
        "dynamic_overhead_ms": round((t_e2e - t_raw) * 1e3, 2),
        "static_overhead_ms": round((t_stat - t_raw) * 1e3, 2),
    }))


if __name__ == "__main__":
    main()
