"""Golden test for the IoU-aware head loss: an independent torch/numpy
re-derivation of the reference pipeline (MaxIoU assignment -> focal +
smooth-L1 + IoU-BCE with avg_factor=num_pos) on handcrafted inputs must
match head.loss applied to the same logits.

This pins the fork's scientific payload end-to-end: assignment rules,
one-hot focal convention (labels-1), delta encode/decode, detached IoU
targets, and every normalization constant."""

import numpy as np
import pytest
import torch
import torch.nn.functional as F

import jax
import jax.numpy as jnp


def torch_reference_loss(anchors, cls_logits, reg_pred, iou_pred, gts, labels,
                         pos_thr=0.5, neg_thr=0.4, gamma=2.0, alpha=0.25,
                         beta=0.11):
    """Pure torch re-derivation of the reference's loss math."""
    A, C = cls_logits.shape
    G = gts.shape[0]

    def iou_matrix(b1, b2):
        a1 = (b1[:, 2] - b1[:, 0] + 1) * (b1[:, 3] - b1[:, 1] + 1)
        a2 = (b2[:, 2] - b2[:, 0] + 1) * (b2[:, 3] - b2[:, 1] + 1)
        lt = torch.max(b1[:, None, :2], b2[None, :, :2])
        rb = torch.min(b1[:, None, 2:], b2[None, :, 2:])
        wh = (rb - lt + 1).clamp(min=0)
        inter = wh[..., 0] * wh[..., 1]
        return inter / (a1[:, None] + a2[None, :] - inter)

    overlaps = iou_matrix(gts, anchors)  # (G, A)
    max_o, argmax_o = overlaps.max(dim=0)
    gt_max, _ = overlaps.max(dim=1)
    assigned = torch.full((A,), -1, dtype=torch.long)
    assigned[(max_o >= 0) & (max_o < neg_thr)] = 0
    pos_inds = max_o >= pos_thr
    assigned[pos_inds] = argmax_o[pos_inds] + 1
    for g in range(G):
        if gt_max[g] >= 0:  # min_pos_iou = 0
            assigned[overlaps[g] == gt_max[g]] = g + 1

    pos = assigned > 0
    neg = assigned == 0
    num_pos = max(int(pos.sum()), 1)

    # focal loss with labels-1 one-hot
    onehot = torch.zeros(A, C)
    tl = torch.zeros(A, dtype=torch.long)
    tl[pos] = labels[assigned[pos] - 1]
    onehot[pos, tl[pos] - 1] = 1.0
    p = cls_logits.sigmoid()
    pt = (1 - p) * onehot + p * (1 - onehot)
    fw = (alpha * onehot + (1 - alpha) * (1 - onehot)) * pt.pow(gamma)
    bce = F.binary_cross_entropy_with_logits(cls_logits, onehot,
                                             reduction="none")
    lw = (pos | neg).float()
    loss_cls = (bce * fw * lw[:, None]).sum() / num_pos

    # smooth l1 on encoded deltas
    def encode(props, gt):
        pw = props[:, 2] - props[:, 0] + 1
        ph = props[:, 3] - props[:, 1] + 1
        px = (props[:, 0] + props[:, 2]) * 0.5
        py = (props[:, 1] + props[:, 3]) * 0.5
        gw = gt[:, 2] - gt[:, 0] + 1
        gh = gt[:, 3] - gt[:, 1] + 1
        gx = (gt[:, 0] + gt[:, 2]) * 0.5
        gy = (gt[:, 1] + gt[:, 3]) * 0.5
        return torch.stack([(gx - px) / pw, (gy - py) / ph,
                            torch.log(gw / pw), torch.log(gh / ph)], -1)

    matched = torch.zeros(A, 4)
    matched[pos] = gts[assigned[pos] - 1]
    targets = torch.zeros(A, 4)
    targets[pos] = encode(anchors[pos], matched[pos])
    diff = (reg_pred - targets).abs()
    sl1 = torch.where(diff < beta, 0.5 * diff ** 2 / beta, diff - 0.5 * beta)
    loss_bbox = (sl1 * pos[:, None].float()).sum() / num_pos

    # IoU branch: BCE(iou_pred, IoU(decoded, gt)) on positives
    def decode(props, deltas):
        pw = props[:, 2] - props[:, 0] + 1
        ph = props[:, 3] - props[:, 1] + 1
        px = (props[:, 0] + props[:, 2]) * 0.5
        py = (props[:, 1] + props[:, 3]) * 0.5
        max_ratio = abs(float(np.log(16 / 1000)))
        dw = deltas[:, 2].clamp(-max_ratio, max_ratio)
        dh = deltas[:, 3].clamp(-max_ratio, max_ratio)
        gw = pw * dw.exp()
        gh = ph * dh.exp()
        gx = px + pw * deltas[:, 0]
        gy = py + ph * deltas[:, 1]
        return torch.stack([gx - gw * 0.5 + 0.5, gy - gh * 0.5 + 0.5,
                            gx + gw * 0.5 - 0.5, gy + gh * 0.5 - 0.5], -1)

    decoded = decode(anchors, reg_pred)
    iou_t = torch.zeros(A)
    if pos.any():
        d = decoded[pos]
        m = matched[pos]
        lt = torch.max(d[:, :2], m[:, :2])
        rb = torch.min(d[:, 2:], m[:, 2:])
        wh = (rb - lt + 1).clamp(min=0)
        inter = wh[:, 0] * wh[:, 1]
        a1 = (d[:, 2] - d[:, 0] + 1) * (d[:, 3] - d[:, 1] + 1)
        a2 = (m[:, 2] - m[:, 0] + 1) * (m[:, 3] - m[:, 1] + 1)
        iou_t[pos] = inter / (a1 + a2 - inter)
    bce_iou = F.binary_cross_entropy_with_logits(iou_pred, iou_t,
                                                 reduction="none")
    loss_iou = (bce_iou * pos.float()).sum() / num_pos
    return float(loss_cls), float(loss_bbox), float(loss_iou), int(pos.sum())


class TestIoUAwareLossGolden:
    def test_matches_torch_derivation(self):
        from ioudet.models.heads import IoUAwareRetinaHead

        # single level, tiny grid: 2x3 cells x 9 anchors = 54 anchors
        head = IoUAwareRetinaHead(
            num_classes=6, in_channels=8, feat_channels=8, stacked_convs=1,
            anchor_strides=(16,),
            loss_cls=dict(type="FocalLoss", use_sigmoid=True, gamma=2.0,
                          alpha=0.25, loss_weight=1.0),
            loss_bbox=dict(type="SmoothL1Loss", beta=0.11, loss_weight=1.0))
        H, W, A, C = 2, 3, 9, 5
        rng = np.random.default_rng(0)
        cls_map = rng.normal(-2, 1, (1, H, W, A * C)).astype(np.float32)
        reg_map = rng.normal(0, 0.3, (1, H, W, A * 4)).astype(np.float32)
        iou_map = rng.normal(0, 1, (1, H, W, A)).astype(np.float32)
        gts = np.array([[4, 4, 28, 30], [30, 10, 46, 29]], np.float32)
        labels = np.array([2, 5], np.int32)

        train_cfg = dict(assigner=dict(pos_iou_thr=0.5, neg_iou_thr=0.4,
                                       min_pos_iou=0, ignore_iof_thr=-1),
                         allowed_border=-1, pos_weight=-1)
        losses = head.loss(
            [jnp.asarray(cls_map)], [jnp.asarray(reg_map)],
            [jnp.asarray(iou_map)],
            jnp.asarray(gts)[None], jnp.asarray(labels)[None],
            jnp.ones((1, 2), bool),
            jnp.asarray([[32, 48]], jnp.int32), jnp.asarray([[32, 48]],
                                                            jnp.int32),
            train_cfg)

        anchors = np.asarray(head.anchor_generators()[0]
                             .grid_anchors((H, W), 16))
        gl_cls, gl_bbox, gl_iou, npos = torch_reference_loss(
            torch.from_numpy(anchors),
            torch.from_numpy(cls_map.reshape(-1, C)),
            torch.from_numpy(reg_map.reshape(-1, 4)),
            torch.from_numpy(iou_map.reshape(-1)),
            torch.from_numpy(gts), torch.from_numpy(labels.astype(np.int64)))

        assert npos > 0, "test setup must produce positives"
        np.testing.assert_allclose(float(losses["loss_cls"]), gl_cls,
                                   rtol=1e-4)
        np.testing.assert_allclose(float(losses["loss_bbox"]), gl_bbox,
                                   rtol=1e-4)
        np.testing.assert_allclose(float(losses["loss_iou"]), gl_iou,
                                   rtol=1e-4)
