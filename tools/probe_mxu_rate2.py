#!/usr/bin/env python
"""MXU peak-rate probe, take 2: INDEPENDENT matmuls (no inter-iteration
dependence through the MXU) accumulating into VMEM scratch, so the measured
rate is the sustainable MXU issue rate per dtype, not a latency chain.
A cheap per-iteration XOR/add on the A operand defeats loop-invariant
hoisting while staying off the critical path (VPU overlaps with MXU).

probe_mxu_rate.py (dependent chain) measured bf16 73.6 / int8 99.1 TOPS —
this one bounds how much of that gap is serialization.
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
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

Mb, Kb, Nb = 512, 2048, 2048
LOOP = 64
REPEAT = 8
FLOPS = 2 * Mb * Kb * Nb * LOOP * REPEAT


def _int8_kernel(a_ref, b_ref, o_ref, acc):
    acc[:] = jnp.zeros_like(acc)

    def body(i, _):
        a = jnp.bitwise_xor(a_ref[:], i.astype(jnp.int8))
        acc[:] += jax.lax.dot_general(
            a, b_ref[:], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.int32)
        return 0

    jax.lax.fori_loop(0, LOOP, body, 0)
    o_ref[:] = acc[:]


def _bf16_kernel(a_ref, b_ref, o_ref, acc):
    acc[:] = jnp.zeros_like(acc)

    def body(i, _):
        a = a_ref[:] + i.astype(jnp.bfloat16)
        acc[:] += jax.lax.dot_general(
            a, b_ref[:], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        return 0

    jax.lax.fori_loop(0, LOOP, body, 0)
    o_ref[:] = acc[:]


def _call(kernel, a, b, acc_dtype):
    return pl.pallas_call(
        kernel,
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM),
                  pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((Mb, Nb), acc_dtype),
        scratch_shapes=[pltpu.VMEM((Mb, Nb), acc_dtype)],
    )(a, b)


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


def main():
    rng = np.random.default_rng(0)
    xs = [jnp.asarray(rng.standard_normal((Mb, Kb)), jnp.float32)
          for _ in range(4)]
    w = jnp.asarray(rng.standard_normal((Kb, Nb)), jnp.float32)
    wq = jnp.clip(jnp.round(w / jnp.max(jnp.abs(w)) * 127), -127, 127
                  ).astype(jnp.int8)
    wb = (w * 0.02).astype(jnp.bfloat16)

    @jax.jit
    def run_int8(x, carry):
        a = jnp.clip(jnp.round(x + carry * 1e-30), -127, 127
                     ).astype(jnp.int8)
        s = jnp.float32(0.0)
        for r in range(REPEAT):
            y = _call(_int8_kernel,
                      jnp.bitwise_xor(a, jnp.int8(r)), wq, jnp.int32)
            s = s + y[0, 0].astype(jnp.float32) * 1e-30
        return s

    @jax.jit
    def run_bf16(x, carry):
        a = (x + carry * 1e-30).astype(jnp.bfloat16)
        s = jnp.float32(0.0)
        for r in range(REPEAT):
            y = _call(_bf16_kernel, a + jnp.bfloat16(r), wb, jnp.float32)
            s = s + y[0, 0].astype(jnp.float32) * 1e-30
        return s

    out = {}
    for name, fn in [("indep_bf16", run_bf16), ("indep_int8", run_int8)]:
        try:
            t = timed(fn, [(x,) for x in xs])
            out[name + "_tops"] = round(FLOPS / t / 1e12, 1)
        except Exception as e:  # noqa: BLE001
            out[name + "_error"] = f"{type(e).__name__}: {str(e)[:300]}"
    if "indep_int8_tops" in out and "indep_bf16_tops" in out:
        out["int8_speedup"] = round(out["indep_int8_tops"]
                                    / out["indep_bf16_tops"], 2)
    print(json.dumps(out, indent=1))


if __name__ == "__main__":
    main()
