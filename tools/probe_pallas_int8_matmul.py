#!/usr/bin/env python
"""Matmul-level probe: can a hand-written Pallas (Mosaic) kernel engage the
v5e's 2x int8 MXU rate (394 int8 TOPS vs 197 bf16 TFLOPS peak) that XLA
refuses to use for s8 convolutions (tools/probe_int8_conv.py: pure s8 conv
== bf16 TOPS)?

Times four programs on one square matmul shape (M=N=K=4096, 137 GFLOP):
  xla_bf16     : jnp.dot bf16 x bf16 -> bf16
  xla_int8     : jnp.dot s8 x s8 -> s32
  pallas_bf16  : tiled Pallas matmul, bf16 operands, f32 accum
  pallas_int8  : tiled Pallas matmul, s8 operands, s32 accum
All four chain REPEAT matmuls inside one jitted program (requantizing the
output back into the input dtype between steps) to amortize the ~27 ms
relay dispatch+fetch latency, and carry-chain across timed calls so the
relay can neither memoize nor elide (see bench.py).
"""

import functools
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                ".."))

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

M = N = K = 4096
REPEAT = 16
FLOPS = 2 * M * N * K * REPEAT


def timed(fn, args_list):
    carry = jnp.float32(0.0)
    carry = fn(*args_list[-1], carry)
    float(carry)
    times = []
    for rep in range(4):
        t0 = time.perf_counter()
        for i in range(2):
            carry = fn(*args_list[(rep * 2 + i) % len(args_list)], carry)
        float(carry)
        times.append((time.perf_counter() - t0) / 2)
    return float(np.median(times))


# ---------------------------------------------------------------- pallas
def _mm_kernel(a_ref, b_ref, o_ref, acc_dtype):
    o_ref[:] = jax.lax.dot_general(
        a_ref[:], b_ref[:], (((1,), (0,)), ((), ())),
        preferred_element_type=acc_dtype)


def pallas_matmul(a, b, acc_dtype, tm=512, tn=1024):
    return pl.pallas_call(
        functools.partial(_mm_kernel, acc_dtype=acc_dtype),
        grid=(M // tm, N // tn),
        in_specs=[
            pl.BlockSpec((tm, K), lambda i, j: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((K, tn), lambda i, j: (0, j),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((tm, tn), lambda i, j: (i, j),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((M, N), acc_dtype),
    )(a, b)


def main():
    rng = np.random.default_rng(0)
    xs = [jnp.asarray(rng.standard_normal((M, K)), jnp.float32)
          for _ in range(4)]
    w = jnp.asarray(rng.standard_normal((K, N)), jnp.float32) * 0.02

    wq = jnp.clip(jnp.round(w / jnp.max(jnp.abs(w)) * 127), -127, 127
                  ).astype(jnp.int8)
    wb = w.astype(jnp.bfloat16)

    @jax.jit
    def xla_bf16(x, carry):
        y = (x + carry * 1e-30).astype(jnp.bfloat16)
        for _ in range(REPEAT):
            y = jnp.dot(y, wb, preferred_element_type=jnp.bfloat16)
            y = y * jnp.bfloat16(0.01)  # keep bounded
        return y[0, 0].astype(jnp.float32)

    @jax.jit
    def xla_int8(x, carry):
        y = jnp.clip(jnp.round(x + carry * 1e-30), -127, 127
                     ).astype(jnp.int8)
        for _ in range(REPEAT):
            y32 = jnp.dot(y, wq, preferred_element_type=jnp.int32)
            y = jnp.clip(y32 // 512, -127, 127).astype(jnp.int8)
        return y[0, 0].astype(jnp.float32)

    @jax.jit
    def p_bf16(x, carry):
        y = (x + carry * 1e-30).astype(jnp.bfloat16)
        for _ in range(REPEAT):
            y32 = pallas_matmul(y, wb, jnp.float32)
            y = (y32 * 0.01).astype(jnp.bfloat16)
        return y[0, 0].astype(jnp.float32)

    @jax.jit
    def p_int8(x, carry):
        y = jnp.clip(jnp.round(x + carry * 1e-30), -127, 127
                     ).astype(jnp.int8)
        for _ in range(REPEAT):
            y32 = pallas_matmul(y, wq, jnp.int32)
            y = jnp.clip(y32 // 512, -127, 127).astype(jnp.int8)
        return y[0, 0].astype(jnp.float32)

    out = {}
    for name, fn in [("xla_bf16", xla_bf16), ("xla_int8", xla_int8),
                     ("pallas_bf16", p_bf16), ("pallas_int8", p_int8)]:
        try:
            t = timed(fn, [(x,) for x in xs])
            out[name + "_tops"] = round(FLOPS / t / 1e12, 1)
        except Exception as e:  # noqa: BLE001 — probe must report, not die
            out[name + "_error"] = f"{type(e).__name__}: {str(e)[:200]}"
    print(json.dumps(out, indent=1))


if __name__ == "__main__":
    main()
