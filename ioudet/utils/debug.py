"""Numerical-health debugging (SURVEY aux §5.2 — the reference had no
sanitizers; XLA has no data races, so the TPU-relevant checks are NaN/Inf
guards and dtype discipline)."""

from __future__ import annotations

from typing import Callable, Dict

import jax
import jax.numpy as jnp


def check_finite(tree, name: str = "tree") -> Dict[str, bool]:
    """Host-side finite check over a pytree; returns offending paths."""
    bad = {}
    for path, leaf in jax.tree_util.tree_flatten_with_path(tree)[0]:
        arr = jax.device_get(leaf)
        if not jnp.isfinite(jnp.asarray(arr)).all():
            bad[jax.tree_util.keystr(path)] = False
    return bad


def checkified(fn: Callable) -> Callable:
    """Wrap a jittable fn with checkify NaN/div-by-zero checks; the returned
    fn raises on the host if any check fired (use in debugging runs only —
    adds overhead)."""
    from jax.experimental import checkify

    checked = checkify.checkify(
        fn, errors=checkify.float_checks)

    def wrapper(*args, **kwargs):
        err, out = checked(*args, **kwargs)
        err.throw()
        return out

    return wrapper


def assert_dtype_policy(params, compute_dtype=jnp.float32) -> None:
    """Training discipline: parameters must be fp32 (bf16 is a compute-only
    policy).  Raises AssertionError listing violations."""
    bad = []
    for path, leaf in jax.tree_util.tree_flatten_with_path(params)[0]:
        if hasattr(leaf, "dtype") and leaf.dtype != jnp.float32:
            bad.append((jax.tree_util.keystr(path), str(leaf.dtype)))
    assert not bad, f"non-fp32 params: {bad}"
