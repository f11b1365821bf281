"""Profiling harness (SURVEY aux §5.1 — the reference had only
IterTimerHook; the TPU equivalent is jax.profiler traces + a step-time
timer)."""

from __future__ import annotations

import contextlib
import time
from typing import Callable, Optional

import jax
import numpy as np


@contextlib.contextmanager
def trace(log_dir: str = "/tmp/ioudet_trace"):
    """Capture a Perfetto/XPlane trace viewable in TensorBoard or
    ui.perfetto.dev."""
    jax.profiler.start_trace(log_dir)
    try:
        yield log_dir
    finally:
        jax.profiler.stop_trace()


def time_fn(fn: Callable, args: tuple, iters: int = 20, warmup: int = 3,
            rotate_args: Optional[list] = None) -> dict:
    """Pipelined timing: enqueue `iters` calls, block once.  `rotate_args`
    (list of arg tuples) defeats runtime memoization of identical calls."""
    argsets = rotate_args or [args]
    for i in range(warmup):
        out = fn(*argsets[i % len(argsets)])
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for i in range(iters):
        out = fn(*argsets[i % len(argsets)])
    jax.block_until_ready(out)
    dt = (time.perf_counter() - t0) / iters
    return dict(mean_s=dt, per_sec=1.0 / dt)


def flops_of(fn: Callable, *args) -> float:
    """XLA cost-analysis FLOPs of a jitted callable."""
    compiled = jax.jit(fn).lower(*args).compile()
    cost = compiled.cost_analysis()
    cost = cost[0] if isinstance(cost, list) else cost
    return float(cost.get("flops", float("nan")))
