"""ops/focal_pallas.py exactness vs the production jnp focal path.

The Pallas kernels are a documented NEGATIVE perf result (XLA's fused jnp
expression is faster on v5e — see the module docstring) but are kept as a
working Mosaic pattern; these tests pin them elementwise to the jnp
formula (CPU interpret mode) so they stay correct if a future toolchain
re-opens the question.
"""

import jax
import jax.numpy as jnp
import numpy as np

from ioudet.models.losses.focal_loss import _fused_focal_sum_impl
from ioudet.ops.focal_pallas import focal_level_dx, focal_level_sum


def _case(dtype=jnp.float32, seed=3):
    rng = np.random.default_rng(seed)
    b, h, w, A, C = 2, 6, 9, 3, 7
    logits = jnp.asarray(rng.normal(0, 4, (b, h, w, A * C)), dtype)
    labels = jnp.asarray(rng.integers(0, C + 1, (b, h * w * A)), jnp.int32)
    lw = jnp.asarray(rng.uniform(size=(b, h * w * A)) < 0.8, jnp.float32)
    return logits, labels, lw, A


def test_fwd_matches_jnp():
    logits, labels, lw, A = _case()
    got = focal_level_sum(logits, labels, lw, 2.0, 0.25, A)
    want = _fused_focal_sum_impl(logits, labels, lw, 2.0, 0.25, A)
    np.testing.assert_allclose(float(got), float(want), rtol=1e-6)


def test_dx_matches_autodiff_of_jnp():
    logits, labels, lw, A = _case()
    g_ref = jax.grad(lambda x: _fused_focal_sum_impl(
        x, labels, lw, 2.0, 0.25, A))(logits)
    dx = focal_level_dx(jnp.float32(1.0), logits, labels, lw, 2.0, 0.25, A)
    np.testing.assert_allclose(np.asarray(dx), np.asarray(g_ref),
                               rtol=1e-5, atol=1e-6)


def test_dx_scales_with_cotangent_and_bf16_dtype():
    logits, labels, lw, A = _case(jnp.bfloat16)
    d1 = focal_level_dx(jnp.float32(1.0), logits, labels, lw, 2.0, 0.25, A)
    d3 = focal_level_dx(jnp.float32(3.0), logits, labels, lw, 2.0, 0.25, A)
    assert d1.dtype == jnp.bfloat16
    np.testing.assert_allclose(np.asarray(d3, np.float32),
                               3.0 * np.asarray(d1, np.float32), rtol=2e-2,
                               atol=1e-6)


def test_row_padding_levels():
    """Shapes that do NOT divide ROWS (every real P4-P7 level) — the row
    padding must not leak into the sum or the dx tail."""
    rng = np.random.default_rng(0)
    b, h, w, A, C = 3, 5, 7, 9, 80
    logits = jnp.asarray(rng.normal(0, 3, (b, h, w, A * C)), jnp.float32)
    labels = jnp.asarray(rng.integers(0, C + 1, (b, h * w * A)), jnp.int32)
    lw = jnp.asarray(rng.uniform(size=(b, h * w * A)), jnp.float32)
    got = focal_level_sum(logits, labels, lw, 2.0, 0.25, A)
    want = _fused_focal_sum_impl(logits, labels, lw, 2.0, 0.25, A)
    np.testing.assert_allclose(float(got), float(want), rtol=1e-6)
    dx = focal_level_dx(jnp.float32(2.0), logits, labels, lw, 2.0, 0.25, A)
    g_ref = jax.grad(lambda x: 2.0 * _fused_focal_sum_impl(
        x, labels, lw, 2.0, 0.25, A))(logits)
    np.testing.assert_allclose(np.asarray(dx), np.asarray(g_ref),
                               rtol=1e-5, atol=1e-6)
