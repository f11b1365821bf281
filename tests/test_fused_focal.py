"""fused_level_focal_sum (the in-place per-level focal path used by
AnchorHead._cls_loss_from_levels) vs the plain elementwise reference:
value exact, gradient to float roundoff — including through the
eager-backward residual (dx computed in the forward pass).
"""

import jax
import jax.numpy as jnp
import numpy as np

from ioudet.models.losses.focal_loss import (fused_level_focal_sum,
                                             sigmoid_focal_loss_with_logits)


def _ref_sum(logits, labels, lw, gamma, alpha, A):
    b, h, w, AC = logits.shape
    C = AC // A
    x = logits.astype(jnp.float32).reshape(b, h, w, A, C)
    lab = labels.reshape(b, h, w, A)
    onehot = ((lab[..., None] - 1 == jnp.arange(C)) &
              (lab[..., None] > 0)).astype(jnp.float32)
    loss = sigmoid_focal_loss_with_logits(x, onehot, gamma=gamma,
                                          alpha=alpha)
    return jnp.sum(jnp.sum(loss, axis=-1) * lw.reshape(b, h, w, A))


def _case(dtype=jnp.float32):
    rng = np.random.default_rng(3)
    b, h, w, A, C = 2, 6, 9, 3, 7
    logits = jnp.asarray(rng.normal(0, 4, (b, h, w, A * C)), dtype)
    labels = jnp.asarray(rng.integers(0, C + 1, (b, h * w * A)), jnp.int32)
    lw = jnp.asarray(rng.uniform(size=(b, h * w * A)) < 0.8, jnp.float32)
    return logits, labels, lw, A


def test_value_matches_reference():
    logits, labels, lw, A = _case()
    got = fused_level_focal_sum(logits, labels, lw, 2.0, 0.25, A)
    want = _ref_sum(logits, labels, lw, 2.0, 0.25, A)
    np.testing.assert_allclose(float(got), float(want), rtol=1e-6)


def test_grad_matches_autodiff_of_reference():
    logits, labels, lw, A = _case()
    g_fused = jax.grad(lambda x: fused_level_focal_sum(
        x, labels, lw, 2.0, 0.25, A))(logits)
    g_ref = jax.grad(lambda x: _ref_sum(x, labels, lw, 2.0, 0.25, A))(logits)
    np.testing.assert_allclose(np.asarray(g_fused), np.asarray(g_ref),
                               rtol=1e-5, atol=1e-6)


def test_grad_scales_with_cotangent():
    """bwd is g * stored-dx; a non-unit upstream cotangent (the avg_factor
    division in the head) must scale the gradient exactly."""
    logits, labels, lw, A = _case()
    g1 = jax.grad(lambda x: fused_level_focal_sum(
        x, labels, lw, 2.0, 0.25, A))(logits)
    g3 = jax.grad(lambda x: 3.0 * fused_level_focal_sum(
        x, labels, lw, 2.0, 0.25, A))(logits)
    np.testing.assert_allclose(np.asarray(g3), 3.0 * np.asarray(g1),
                               rtol=1e-6)


def test_bf16_logits_grad_dtype_and_finite():
    logits, labels, lw, A = _case(jnp.bfloat16)
    val, grad = jax.value_and_grad(lambda x: fused_level_focal_sum(
        x, labels, lw, 2.0, 0.25, A))(logits)
    assert grad.dtype == jnp.bfloat16
    assert np.isfinite(float(val))
    assert np.isfinite(np.asarray(grad, np.float32)).all()
