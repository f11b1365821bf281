"""FreeAnchor loss vs an independent torch derivation (VERDICT r2 item 8:
FreeAnchor rode on property/smoke tests only).

The torch side re-derives the FreeAnchor objective from the paper/reference
spec (ref: mmdet/models/anchor_heads/free_anchor_retina_head.py
(FreeAnchorRetinaHead.loss, positive_bag_loss, negative_bag_loss)):
  positive: -log(mean-max_{bag}(P_cls * exp(-w_reg * smoothL1))) per gt,
            mean-max weights 1/(1-p) normalized; summed, / num_gts
  negative: sum of (p*(1-P_match))^gamma * -log(1 - p*(1-P_match)),
            / (num_gts * topk)
  P_match:  saturated-linear in decoded-box IoU between bbox_thr and the
            per-gt max, unioned over gts per class.
(The reg weight inside exp(-.) follows this head's spec, 2.0.)"""

import numpy as np
import jax.numpy as jnp
import torch

from ioudet.models.heads import FreeAnchorRetinaHead


def torch_free_anchor_loss(cls_maps, box_maps, anchors_np, gts, labels,
                           topk=6, bbox_thr=0.6, gamma=2.0, alpha=0.5,
                           beta=0.11, reg_w=2.0, C=3, bags=None):
    """Independent torch re-derivation; per-image lists, all-valid gts.

    ``bags``: optional per-image (G, K) anchor indices to use as the
    positive bags.  The anchor grid guarantees exact IoU TIES (an anchor
    fully containing a gt has the same IoU at every offset), and jax/torch
    top-k break ties differently — so the caller may pass the
    implementation's bag, and this function ASSERTS the bag's IoU multiset
    equals torch's own top-k multiset (the selection rule is still pinned;
    only the arbitrary tie choice is accepted)."""
    total_pos, pos_sum, neg_sum = 0, 0.0, 0.0
    B = len(cls_maps)
    for b in range(B):
        cls_prob = torch.sigmoid(torch.from_numpy(cls_maps[b]))  # (A, C)
        box_pred = torch.from_numpy(box_maps[b])                 # (A, 4)
        anchors = torch.from_numpy(anchors_np)
        gb = torch.from_numpy(gts[b])                            # (G, 4)
        gl = torch.from_numpy(labels[b])                         # (G,) 1-based
        G = gb.shape[0]
        total_pos += G

        # decode (means 0 / stds 1, +1 convention, ratio clip)
        pw = anchors[:, 2] - anchors[:, 0] + 1
        ph = anchors[:, 3] - anchors[:, 1] + 1
        px = (anchors[:, 0] + anchors[:, 2]) / 2
        py = (anchors[:, 1] + anchors[:, 3]) / 2
        mr = abs(np.log(16 / 1000))
        gw = pw * box_pred[:, 2].clamp(-mr, mr).exp()
        gh = ph * box_pred[:, 3].clamp(-mr, mr).exp()
        gx = px + pw * box_pred[:, 0]
        gy = py + ph * box_pred[:, 1]
        decoded = torch.stack([gx - gw / 2 + 0.5, gy - gh / 2 + 0.5,
                               gx + gw / 2 - 0.5, gy + gh / 2 - 0.5], -1)

        def iou(a, bboxes):
            iw = (torch.min(a[:, None, 2], bboxes[None, :, 2])
                  - torch.max(a[:, None, 0], bboxes[None, :, 0]) + 1).clamp(0)
            ih = (torch.min(a[:, None, 3], bboxes[None, :, 3])
                  - torch.max(a[:, None, 1], bboxes[None, :, 1]) + 1).clamp(0)
            inter = iw * ih
            aa = ((a[:, 2] - a[:, 0] + 1) * (a[:, 3] - a[:, 1] + 1))[:, None]
            ab = ((bboxes[:, 2] - bboxes[:, 0] + 1)
                  * (bboxes[:, 3] - bboxes[:, 1] + 1))[None]
            return inter / (aa + ab - inter)

        # ---- negatives: P{a matched to some gt of class c}
        obj_iou = iou(gb, decoded)                                # (G, A)
        t2 = obj_iou.max(dim=1, keepdim=True).values.clamp(
            min=bbox_thr + 1e-12)
        obj_prob = ((obj_iou - bbox_thr) / (t2 - bbox_thr)).clamp(0, 1)
        box_prob = torch.zeros_like(cls_prob)                     # (A, C)
        for g in range(G):
            c = int(gl[g]) - 1
            box_prob[:, c] = torch.maximum(box_prob[:, c], obj_prob[g])
        neg_prob = (cls_prob * (1 - box_prob)).clamp(1e-12, 1 - 1e-12)
        neg_sum += float((neg_prob ** gamma
                          * -torch.log(1 - neg_prob)).sum())

        # ---- positive bags
        anchor_iou = iou(gb, anchors)                             # (G, A)
        top_vals, bag = torch.topk(anchor_iou, topk, dim=1)       # (G, K)
        if bags is not None:
            given = torch.from_numpy(np.asarray(bags[b]))
            # tie-equivalent selection: identical IoU multiset per gt
            got_vals = torch.gather(anchor_iou, 1, given)
            np.testing.assert_allclose(
                np.sort(got_vals.numpy(), axis=1),
                np.sort(top_vals.numpy(), axis=1), rtol=1e-6, atol=1e-6)
            bag = given
        for g in range(G):
            c = int(gl[g]) - 1
            p_cls = cls_prob[bag[g], c]                           # (K,)
            anc = anchors[bag[g]]
            aw = anc[:, 2] - anc[:, 0] + 1
            ah = anc[:, 3] - anc[:, 1] + 1
            ax = (anc[:, 0] + anc[:, 2]) / 2
            ay = (anc[:, 1] + anc[:, 3]) / 2
            tw = gb[g, 2] - gb[g, 0] + 1
            th = gb[g, 3] - gb[g, 1] + 1
            tx = (gb[g, 0] + gb[g, 2]) / 2
            ty = (gb[g, 1] + gb[g, 3]) / 2
            tgt = torch.stack([(tx - ax) / aw, (ty - ay) / ah,
                               torch.log(tw / aw), torch.log(th / ah)], -1)
            diff = (box_pred[bag[g]] - tgt).abs()
            sl1 = torch.where(diff < beta, 0.5 * diff * diff / beta,
                              diff - 0.5 * beta).sum(-1)
            p = (p_cls * torch.exp(-sl1 * reg_w)).clamp(0, 1 - 1e-6)
            w = 1.0 / (1.0 - p)
            w = w / w.sum()
            bag_prob = (w * p).sum().clamp(min=1e-12)
            pos_sum += float(-torch.log(bag_prob))

    total_pos = max(total_pos, 1)
    return (alpha * pos_sum / total_pos,
            (1 - alpha) * neg_sum / (total_pos * topk))


def test_loss_matches_torch_derivation():
    C = 3  # cls_out_channels (num_classes=4, sigmoid)
    head = FreeAnchorRetinaHead(num_classes=4, in_channels=8,
                                feat_channels=8, stacked_convs=1,
                                anchor_strides=(8, 16),
                                pre_anchor_topk=6)
    sizes = [(4, 6), (2, 3)]
    rng = np.random.default_rng(7)
    A9 = head.num_anchors
    cls_maps = [rng.normal(-2, 1, (2, h, w, A9 * C)).astype(np.float32)
                for h, w in sizes]
    box_maps = [rng.normal(0, 0.3, (2, h, w, A9 * 4)).astype(np.float32)
                for h, w in sizes]
    G = 3
    xy = rng.uniform(0, 20, (2, G, 2)).astype(np.float32)
    wh = rng.uniform(8, 25, (2, G, 2)).astype(np.float32)
    gts = np.concatenate([xy, xy + wh], -1)
    labels = rng.integers(1, 4, (2, G)).astype(np.int32)

    losses = head.loss(
        [jnp.asarray(m) for m in cls_maps],
        [jnp.asarray(m) for m in box_maps],
        jnp.asarray(gts), jnp.asarray(labels), jnp.ones((2, G), bool),
        jnp.asarray([[32, 48], [32, 48]], jnp.int32),
        jnp.asarray([[32, 48], [32, 48]], jnp.int32), dict())

    anchors = np.concatenate([
        np.asarray(g.grid_anchors(s, st), np.float32) for g, s, st in
        zip(head.anchor_generators(), sizes, head.anchor_strides)])
    flat_cls = [np.concatenate([m[b].reshape(-1, C) for m in cls_maps])
                for b in range(2)]
    flat_box = [np.concatenate([m[b].reshape(-1, 4) for m in box_maps])
                for b in range(2)]
    # the implementation's bag choice (jax top_k tie-breaking); the torch
    # side verifies its IoU multiset matches torch's own top-k
    import jax
    from ioudet.core.bbox import bbox_overlaps as bo
    bags = [np.asarray(jax.lax.top_k(
        bo(jnp.asarray(gts[b]), jnp.asarray(anchors)), 6)[1])
        for b in range(2)]
    want_pos, want_neg = torch_free_anchor_loss(
        flat_cls, flat_box, anchors, [gts[0], gts[1]],
        [labels[0], labels[1]], topk=6, bags=bags)

    np.testing.assert_allclose(float(losses["loss_cls"]), want_pos,
                               rtol=1e-4)
    np.testing.assert_allclose(float(losses["loss_bbox"]), want_neg,
                               rtol=1e-4)


def test_invalid_gts_are_masked():
    """A padded (invalid) gt slot must contribute nothing: the loss equals
    the torch derivation computed WITHOUT that gt."""
    C = 3
    head = FreeAnchorRetinaHead(num_classes=4, in_channels=8,
                                feat_channels=8, stacked_convs=1,
                                anchor_strides=(8,), pre_anchor_topk=4)
    sizes = [(4, 6)]
    rng = np.random.default_rng(8)
    A9 = head.num_anchors
    cls_maps = [rng.normal(-2, 1, (1, 4, 6, A9 * C)).astype(np.float32)]
    box_maps = [rng.normal(0, 0.3, (1, 4, 6, A9 * 4)).astype(np.float32)]
    gts = np.asarray([[[2.0, 2.0, 20.0, 18.0], [5.0, 5.0, 28.0, 25.0],
                       [0.0, 0.0, 30.0, 30.0]]], np.float32)
    labels = np.asarray([[1, 2, 3]], np.int32)
    gv = np.asarray([[True, True, False]])  # last gt is padding

    losses = head.loss(
        [jnp.asarray(cls_maps[0])], [jnp.asarray(box_maps[0])],
        jnp.asarray(gts), jnp.asarray(labels), jnp.asarray(gv),
        jnp.asarray([[32, 48]], jnp.int32),
        jnp.asarray([[32, 48]], jnp.int32), dict())

    anchors = np.concatenate([
        np.asarray(g.grid_anchors(s, st), np.float32) for g, s, st in
        zip(head.anchor_generators(), sizes, head.anchor_strides)])
    import jax
    from ioudet.core.bbox import bbox_overlaps as bo
    bags = [np.asarray(jax.lax.top_k(
        bo(jnp.asarray(gts[0, :2]), jnp.asarray(anchors)), 4)[1])]
    want_pos, want_neg = torch_free_anchor_loss(
        [cls_maps[0][0].reshape(-1, C)], [box_maps[0][0].reshape(-1, 4)],
        anchors, [gts[0, :2]], [labels[0, :2]], topk=4, bags=bags)
    np.testing.assert_allclose(float(losses["loss_cls"]), want_pos,
                               rtol=1e-4)
    np.testing.assert_allclose(float(losses["loss_bbox"]), want_neg,
                               rtol=1e-4)
