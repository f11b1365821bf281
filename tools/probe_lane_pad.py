#!/usr/bin/env python
"""Lane-padding probe for the retina head's final convs (VERDICT r4 next #1).

The head's prediction convs have lane-misaligned output channels on TPU
(128-wide vector lanes / MXU tiles):
  retina_cls: 256 -> 720 (9 anchors x 80 classes = 5.625 x 128)
  retina_reg: 256 -> 36
  retina_iou: 256 -> 9
Question: does padding the output channels up to a multiple of 128 (and
slicing back) beat the misaligned conv, or does XLA already pad internally?

Times each (in_ch -> out_ch) 3x3 conv at every FPN level size, REPEAT reps
chained inside one program (amortizes the ~27 ms relay dispatch+fetch), bf16.
Prints one JSON line per (level, variant).
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

REPEAT = 64  # convs chained inside one program; per-rep dispatch overhead
#              ~27 ms / (chain*REPEAT) ≈ 0.2 ms — small convs stay visible


def timed(fn, base, k, iters=6, chain=2):
    """Relay-safe timing with NO per-iteration host->device transfer: one
    device-resident base buffer, a varying SCALAR makes each call's inputs
    unique (the relay memoizes identical (program, args)); the carry chains
    calls serially and the scalar fetch forces execution."""
    carry = jnp.float32(0.0)
    for i in range(2):
        carry = fn(carry, base, k, jnp.float32(100 + i))
    float(carry)
    times = []
    for rep in range(iters // chain):
        t0 = time.perf_counter()
        for i in range(chain):
            carry = fn(carry, base, k, jnp.float32(rep * chain + i))
        float(carry)
        times.append((time.perf_counter() - t0) / chain)
    return float(np.median(times))


def main():
    batch = int(os.environ.get("PROF_BATCH", 16))
    canvas = (832, 1344)
    strides = (8, 16, 32, 64, 128)
    sizes = [(canvas[0] // s, canvas[1] // s) for s in strides]
    rng = np.random.default_rng(0)

    results = {}
    # (name, real out_ch, padded out_ch)
    cases = [("retina_cls", 720, 768), ("retina_reg", 36, 128),
             ("retina_iou", 9, 128)]

    for lvl, (h, w) in enumerate(sizes):
        base = jnp.asarray(rng.normal(0, 1, (batch, h, w, 256)).astype(
            np.float32))
        for name, oc_real, oc_pad in cases:
            for oc, tag in ((oc_real, "real"), (oc_pad, "padded")):
                k_np = rng.normal(0, 0.01, (3, 3, 256, oc)).astype(np.float32)

                @jax.jit
                def run(carry, x, k, salt, oc_real=oc_real, oc=oc):
                    x = (x + carry * 1e-30 + salt * 1e-6).astype(jnp.bfloat16)
                    k = k.astype(jnp.bfloat16)
                    y = x
                    for _ in range(REPEAT):
                        o = jax.lax.conv_general_dilated(
                            y, k, (1, 1), "SAME",
                            dimension_numbers=("NHWC", "HWIO", "NHWC"))
                        o = o[..., :oc_real]  # slice back (no-op when real)
                        # FULL dependence: a channel reduce needs every
                        # output element, so nothing is DCE'd (a single-pixel
                        # carry lets XLA prune the conv to one output pixel —
                        # measured 457 "TF/s" > chip peak before this fix)
                        s = jnp.sum(o, axis=-1, keepdims=True)
                        y = x + s * 1e-30
                    return jnp.sum(s[:1, :1, :1, :1].astype(jnp.float32))

                dt = timed(run, base, jnp.asarray(k_np)) / REPEAT
                flops = 2 * batch * h * w * 256 * oc * 9
                key = f"P{3+lvl}_{name}_{tag}"
                results[key] = dict(ms=round(dt * 1e3, 3),
                                    tflops=round(flops / dt / 1e12, 1))
                print(json.dumps({key: results[key]}), flush=True)

    # summary: total head-final-conv time real vs padded across levels
    tot_real = sum(v["ms"] for k, v in results.items() if k.endswith("real"))
    tot_pad = sum(v["ms"] for k, v in results.items() if k.endswith("padded"))
    print(json.dumps({"total_real_ms": round(tot_real, 2),
                      "total_padded_ms": round(tot_pad, 2)}))


if __name__ == "__main__":
    main()
