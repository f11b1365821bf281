"""Loss parity tests vs independent torch implementations of the reference
formulas (py_sigmoid_focal_loss, smooth-L1, BCE, avg_factor convention)."""

import numpy as np
import torch
import torch.nn.functional as F

from ioudet.models.losses import (FocalLoss, SmoothL1Loss, CrossEntropyLoss,
                                  sigmoid_focal_loss, smooth_l1_loss,
                                  binary_cross_entropy, GHMC, GHMR,
                                  BalancedL1Loss, IoULoss)


def torch_py_sigmoid_focal_loss(pred, target, gamma=2.0, alpha=0.25):
    pred_sigmoid = pred.sigmoid()
    target = target.type_as(pred)
    pt = (1 - pred_sigmoid) * target + pred_sigmoid * (1 - target)
    fw = (alpha * target + (1 - alpha) * (1 - target)) * pt.pow(gamma)
    return F.binary_cross_entropy_with_logits(pred, target, reduction="none") * fw


class TestFocal:
    def test_matches_torch_elementwise(self):
        rng = np.random.default_rng(0)
        logits = rng.normal(0, 3, (128, 10)).astype(np.float32)
        labels = rng.integers(0, 11, 128).astype(np.int32)  # 0=bg, 1..10 fg
        ours = np.asarray(sigmoid_focal_loss(logits, labels, reduction="none"))
        onehot = np.zeros((128, 10), np.float32)
        fg = labels > 0
        onehot[np.arange(128)[fg], labels[fg] - 1] = 1
        golden = torch_py_sigmoid_focal_loss(
            torch.from_numpy(logits), torch.from_numpy(onehot)).numpy()
        np.testing.assert_allclose(ours, golden, rtol=1e-4, atol=1e-6)

    def test_avg_factor(self):
        rng = np.random.default_rng(1)
        logits = rng.normal(0, 1, (64, 5)).astype(np.float32)
        labels = rng.integers(0, 6, 64).astype(np.int32)
        weight = (rng.uniform(0, 1, 64) > 0.3).astype(np.float32)
        num_pos = float(((labels > 0) * weight).sum()) + 1.0
        loss_cls = FocalLoss(use_sigmoid=True, gamma=2.0, alpha=0.25)
        ours = float(loss_cls(logits, labels, weight=weight, avg_factor=num_pos))
        onehot = np.zeros((64, 5), np.float32)
        fg = labels > 0
        onehot[np.arange(64)[fg], labels[fg] - 1] = 1
        golden_el = torch_py_sigmoid_focal_loss(
            torch.from_numpy(logits), torch.from_numpy(onehot)).numpy()
        golden = (golden_el * weight[:, None]).sum() / num_pos
        np.testing.assert_allclose(ours, golden, rtol=1e-4)


class TestSmoothL1:
    def test_matches_torch(self):
        rng = np.random.default_rng(2)
        pred = rng.normal(0, 1, (100, 4)).astype(np.float32)
        target = rng.normal(0, 1, (100, 4)).astype(np.float32)
        for beta in [0.11, 1.0]:
            ours = np.asarray(smooth_l1_loss(pred, target, reduction="none",
                                             beta=beta))
            golden = F.smooth_l1_loss(torch.from_numpy(pred),
                                      torch.from_numpy(target),
                                      reduction="none", beta=beta).numpy()
            np.testing.assert_allclose(ours, golden, rtol=1e-5, atol=1e-6)

    def test_class_with_avg_factor(self):
        rng = np.random.default_rng(3)
        pred = rng.normal(0, 1, (50, 4)).astype(np.float32)
        target = rng.normal(0, 1, (50, 4)).astype(np.float32)
        weight = np.repeat((rng.uniform(0, 1, 50) > 0.5)[:, None], 4, 1).astype(np.float32)
        loss = SmoothL1Loss(beta=0.11, loss_weight=1.0)
        avg = weight[:, 0].sum() + 1
        ours = float(loss(pred, target, weight=weight, avg_factor=avg))
        golden_el = F.smooth_l1_loss(torch.from_numpy(pred),
                                     torch.from_numpy(target),
                                     reduction="none", beta=0.11).numpy()
        np.testing.assert_allclose(ours, (golden_el * weight).sum() / avg, rtol=1e-4)


class TestBCE:
    def test_soft_target_matches_torch(self):
        rng = np.random.default_rng(4)
        pred = rng.normal(0, 2, 200).astype(np.float32)
        target = rng.uniform(0, 1, 200).astype(np.float32)  # soft IoU targets
        ours = np.asarray(binary_cross_entropy(pred, target, reduction="none"))
        golden = F.binary_cross_entropy_with_logits(
            torch.from_numpy(pred), torch.from_numpy(target),
            reduction="none").numpy()
        np.testing.assert_allclose(ours, golden, rtol=1e-4, atol=1e-6)

    def test_crossentropy_class(self):
        rng = np.random.default_rng(5)
        pred = rng.normal(0, 1, (30, 7)).astype(np.float32)
        label = rng.integers(0, 7, 30)
        ce = CrossEntropyLoss()
        ours = float(ce(pred, label))
        golden = F.cross_entropy(torch.from_numpy(pred),
                                 torch.from_numpy(label)).numpy()
        np.testing.assert_allclose(ours, golden, rtol=1e-5)


class TestOtherLosses:
    def test_ghmc_runs_finite(self):
        rng = np.random.default_rng(6)
        pred = rng.normal(0, 1, (64, 10)).astype(np.float32)
        target = (rng.uniform(0, 1, (64, 10)) > 0.9).astype(np.float32)
        lw = np.ones((64, 10), np.float32)
        val = float(GHMC()(pred, target, lw))
        assert np.isfinite(val) and val > 0

    def test_ghmr_runs_finite(self):
        rng = np.random.default_rng(7)
        pred = rng.normal(0, 1, (64, 4)).astype(np.float32)
        target = rng.normal(0, 1, (64, 4)).astype(np.float32)
        lw = np.ones((64, 4), np.float32)
        val = float(GHMR()(pred, target, lw))
        assert np.isfinite(val) and val > 0

    def test_balanced_l1_zero_at_equal(self):
        pred = np.ones((8, 4), np.float32)
        val = float(BalancedL1Loss()(pred, pred))
        assert abs(val) < 1e-6

    def test_iou_loss_perfect_overlap(self):
        b = np.array([[0, 0, 10, 10]], np.float32)
        assert float(IoULoss()(b, b)) < 1e-5

class TestFocalCustomVJP:
    """The custom_vjp backward (one-exp recompute; ~25% faster fwd+bwd on
    v5e at train shapes) must match autodiff of the plain formula to float
    roundoff, including vs a torch-autograd golden."""

    def test_grad_matches_torch_autograd(self):
        import jax
        import jax.numpy as jnp
        from ioudet.models.losses.focal_loss import \
            sigmoid_focal_loss_with_logits
        rng = np.random.default_rng(7)
        logits = rng.normal(0, 3, (64, 10)).astype(np.float32)
        onehot = (rng.uniform(size=(64, 10)) > 0.8).astype(np.float32)
        g = jax.grad(lambda x: jnp.sum(
            sigmoid_focal_loss_with_logits(x, jnp.asarray(onehot))))(
            jnp.asarray(logits))
        tx = torch.from_numpy(logits).requires_grad_(True)
        torch_py_sigmoid_focal_loss(tx, torch.from_numpy(onehot)).sum(
            ).backward()
        np.testing.assert_allclose(np.asarray(g), tx.grad.numpy(),
                                   rtol=1e-4, atol=1e-5)

    def test_grad_at_extreme_logits_finite(self):
        import jax
        import jax.numpy as jnp
        from ioudet.models.losses.focal_loss import \
            sigmoid_focal_loss_with_logits
        x = jnp.asarray([-40.0, -5.0, 0.0, 5.0, 40.0], jnp.float32)
        t = jnp.asarray([1.0, 0.0, 1.0, 0.0, 1.0], jnp.float32)
        g = jax.grad(lambda a: jnp.sum(
            sigmoid_focal_loss_with_logits(a, t)))(x)
        assert np.isfinite(np.asarray(g)).all()
