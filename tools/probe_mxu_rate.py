#!/usr/bin/env python
"""PURE MXU-rate probe: is the v5e's 2x int8 MXU rate (394 int8 TOPS vs
197 bf16 TFLOPS peak) reachable from Mosaic/Pallas at all?

Method: one Pallas program (grid=1) whose operands live entirely in VMEM;
the kernel chains LOOP dependent matmuls with a cheap requant between
steps — zero HBM traffic inside the loop, so the measured time is MXU
issue rate + VPU requant glue, nothing else.  bf16 twin is identical
modulo dtype.  Timed via carry-chained jit calls (REPEAT programs per
fetch) per the relay rules in bench.py.

This is the experiment VERDICT r3 'weak #1 / next #1' asks for: if
pallas_int8_tops ~~ 2x pallas_bf16_tops, a hand-written int8 conv kernel
can halve the conv portion of inference; if they are equal, the ceiling
is hardware/toolchain and the negative result closes the question.
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

Mb, Kb, Nb = 512, 2048, 2048   # VMEM-resident block
LOOP = 64                      # dependent matmuls inside one kernel
REPEAT = 8                     # kernels chained inside one jit program
FLOPS = 2 * Mb * Kb * Nb * LOOP * REPEAT


def _int8_kernel(a_ref, b_ref, o_ref):
    def body(i, y):
        y32 = jax.lax.dot_general(y, b_ref[:], (((1,), (0,)), ((), ())),
                                  preferred_element_type=jnp.int32)
        return jnp.clip(y32 >> 9, -127, 127).astype(jnp.int8)
    o_ref[:] = jax.lax.fori_loop(0, LOOP, body, a_ref[:])


def _bf16_kernel(a_ref, b_ref, o_ref):
    def body(i, y):
        y32 = jax.lax.dot_general(y, b_ref[:], (((1,), (0,)), ((), ())),
                                  preferred_element_type=jnp.float32)
        return (y32 * 0.01).astype(jnp.bfloat16)
    o_ref[:] = jax.lax.fori_loop(0, LOOP, body, a_ref[:])


def _call(kernel, a, b, out_dtype):
    return pl.pallas_call(
        kernel,
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM),
                  pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((Mb, Nb), out_dtype),
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
        y = jnp.clip(jnp.round(x + carry * 1e-30), -127, 127
                     ).astype(jnp.int8)
        for _ in range(REPEAT):
            y = _call(_int8_kernel, y, wq, jnp.int8)
        return y[0, 0].astype(jnp.float32)

    @jax.jit
    def run_bf16(x, carry):
        y = (x + carry * 1e-30).astype(jnp.bfloat16)
        for _ in range(REPEAT):
            y = _call(_bf16_kernel, y, wb, jnp.bfloat16)
        return y[0, 0].astype(jnp.float32)

    out = {}
    for name, fn in [("pallas_vmem_bf16", run_bf16),
                     ("pallas_vmem_int8", run_int8)]:
        try:
            t = timed(fn, [(x,) for x in xs])
            out[name + "_tops"] = round(FLOPS / t / 1e12, 1)
        except Exception as e:  # noqa: BLE001
            out[name + "_error"] = f"{type(e).__name__}: {str(e)[:300]}"
    if "pallas_vmem_int8_tops" in out and "pallas_vmem_bf16_tops" in out:
        out["int8_speedup"] = round(out["pallas_vmem_int8_tops"]
                                    / out["pallas_vmem_bf16_tops"], 2)
    print(json.dumps(out, indent=1))


if __name__ == "__main__":
    main()
