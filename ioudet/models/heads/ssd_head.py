"""SSD head (ref: mmdet/models/anchor_heads/ssd_head.py (SSDHead)).

Per-level convs producing softmax class scores (num_classes incl background)
and box deltas over SSD anchors (min/max size + ratio family per level).
Loss = softmax CE with 3:1 online hard-negative mining + smooth-L1,
normalized by num_pos — the reference mines negatives with ``nonzero`` and
``topk`` per image; here mining is a fixed-shape top-k over the per-anchor
negative losses (identical selection, no dynamic shapes).
"""

from __future__ import annotations

from typing import Any, Dict, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from ...core.anchor import AnchorGenerator, anchor_target
from ...core.bbox import MaxIoUAssigner
from ..registry import HEADS
from .anchor_head import AnchorHead, _CONV_INIT


def ssd_anchor_generators(input_size: int, in_channels: Sequence[int],
                          anchor_strides: Sequence[int],
                          basesize_ratio_range: Tuple[float, float],
                          anchor_ratios: Sequence[Sequence[float]]):
    """ref: SSDHead.__init__ anchor sizing: min_sizes from the ratio range,
    scales [1, sqrt(max/min)], ratio family per level."""
    min_ratio, max_ratio = basesize_ratio_range
    min_ratio, max_ratio = int(min_ratio * 100), int(max_ratio * 100)
    num_levels = len(in_channels)
    step = int(np.floor(max_ratio - min_ratio) / (num_levels - 2))
    min_sizes, max_sizes = [], []
    for r in range(min_ratio, max_ratio + 1, step):
        min_sizes.append(int(input_size * r / 100))
        max_sizes.append(int(input_size * (r + step) / 100))
    if input_size == 300:
        if basesize_ratio_range[0] == 0.15:
            min_sizes.insert(0, int(input_size * 7 / 100))
            max_sizes.insert(0, int(input_size * 15 / 100))
        else:
            min_sizes.insert(0, int(input_size * 10 / 100))
            max_sizes.insert(0, int(input_size * 20 / 100))
    else:
        min_sizes.insert(0, int(input_size * 4 / 100))
        max_sizes.insert(0, int(input_size * 10 / 100))
    gens = []
    for k in range(num_levels):
        base = min_sizes[k]
        stride = anchor_strides[k]
        ctr = ((stride - 1) / 2.0, (stride - 1) / 2.0)
        scales = [1.0, np.sqrt(max_sizes[k] / min_sizes[k])]
        ratios = [1.0]
        for r in anchor_ratios[k]:
            ratios += [1 / r, r]
        gen = AnchorGenerator(base, scales, ratios, scale_major=False, ctr=ctr)
        # ref keeps: 2 square anchors (scale 1 & sqrt) + ratio anchors at scale 1
        keep = list(range(len(ratios))) + [len(ratios)]
        gen.base_anchors = gen.base_anchors[keep]
        gens.append(gen)
    return gens


@HEADS.register_module
class SSDHead(AnchorHead):
    input_size: int = 300
    in_channels_list: Tuple[int, ...] = (512, 1024, 512, 256, 256, 256)
    basesize_ratio_range: Tuple[float, float] = (0.15, 0.9)
    anchor_ratios_per_level: Tuple[Tuple[float, ...], ...] = (
        (2,), (2, 3), (2, 3), (2, 3), (2,), (2,))
    anchor_strides: Tuple[int, ...] = (8, 16, 32, 64, 100, 300)
    use_sigmoid_cls: bool = False
    neg_pos_ratio: int = 3
    smoothl1_beta: float = 1.0
    target_means: Tuple[float, ...] = (0.0, 0.0, 0.0, 0.0)
    target_stds: Tuple[float, ...] = (0.1, 0.1, 0.2, 0.2)

    @property
    def cls_out_channels(self) -> int:
        return self.num_classes  # softmax incl. background

    def anchor_generators(self):
        return ssd_anchor_generators(self.input_size, self.in_channels_list,
                                     self.anchor_strides,
                                     self.basesize_ratio_range,
                                     self.anchor_ratios_per_level)

    def _num_anchors_per_level(self):
        return [g.num_base_anchors for g in self.anchor_generators()]

    @nn.compact
    def __call__(self, feats, train: bool = False):
        num_anchors = self._num_anchors_per_level()
        cls_scores, bbox_preds = [], []
        for i, x in enumerate(feats):
            cls_scores.append(
                nn.Conv(num_anchors[i] * self.cls_out_channels, (3, 3),
                        padding=1, kernel_init=_CONV_INIT, dtype=self.dtype,
                        name=f"cls_conv{i}")(x))
            bbox_preds.append(
                nn.Conv(num_anchors[i] * 4, (3, 3), padding=1,
                        kernel_init=_CONV_INIT, dtype=self.dtype,
                        name=f"reg_conv{i}")(x))
        return cls_scores, bbox_preds

    def _flatten_levels_ssd(self, preds, ch, num_anchors):
        flat = []
        for p, a in zip(preds, num_anchors):
            b, h, w, _ = p.shape
            flat.append(p.reshape(b, h * w * a, ch))
        return jnp.concatenate(flat, axis=1)

    def get_anchors(self, featmap_sizes, pad_shapes):
        gens = self.anchor_generators()
        anchors = jnp.concatenate(
            [g.grid_anchors(fs, s) for g, fs, s in
             zip(gens, featmap_sizes, self.anchor_strides)], axis=0)

        def per_image(shape):
            flags = []
            for g, fs, s in zip(gens, featmap_sizes, self.anchor_strides):
                vh = jnp.minimum(jnp.ceil(shape[0] / s).astype(jnp.int32), fs[0])
                vw = jnp.minimum(jnp.ceil(shape[1] / s).astype(jnp.int32), fs[1])
                flags.append(g.valid_flags(fs, (vh, vw)))
            return jnp.concatenate(flags)

        valid = jax.vmap(per_image)(pad_shapes)
        return anchors, valid

    def decode_candidates(self, cls_scores, bbox_preds, img_shapes, test_cfg,
                          score_factors=None):
        """SSD-specific decode: per-level anchor counts vary (4 or 6), and
        classification is softmax with a background column."""
        import jax as _jax
        from ...core.bbox.transforms import delta2bbox
        from .anchor_head import clip_boxes

        nms_pre = test_cfg.get("nms_pre", 1000)
        featmap_sizes = [(p.shape[1], p.shape[2]) for p in cls_scores]
        gens = self.anchor_generators()
        level_anchors = [g.grid_anchors(fs, st) for g, fs, st in
                         zip(gens, featmap_sizes, self.anchor_strides)]
        num_anchors = self._num_anchors_per_level()
        n_lvl = len(cls_scores)

        def single(img_shape, *flat):
            scores_l = flat[:n_lvl]
            boxes_l = flat[n_lvl:]
            cand_b, cand_s = [], []
            for lvl in range(n_lvl):
                h, w, _ = scores_l[lvl].shape
                n = h * w * num_anchors[lvl]
                probs = _jax.nn.softmax(
                    scores_l[lvl].reshape(n, self.cls_out_channels), -1)[:, 1:]
                pairs = jnp.concatenate(
                    [level_anchors[lvl], boxes_l[lvl].reshape(n, 4)], axis=-1)
                probs, _, pairs = self._level_topk(probs, None, pairs,
                                                   min(nms_pre, n))
                boxes = delta2bbox(pairs[:, :4], pairs[:, 4:],
                                   self.target_means, self.target_stds)
                cand_b.append(clip_boxes(boxes, img_shape))
                cand_s.append(probs)
            return jnp.concatenate(cand_b), jnp.concatenate(cand_s)

        args = list(cls_scores) + list(bbox_preds)
        return _jax.vmap(single)(img_shapes, *args)

    def loss(self, cls_scores, bbox_preds, gt_bboxes, gt_labels, gt_valid,
             img_shapes, pad_shapes, train_cfg) -> Dict[str, jnp.ndarray]:
        from ..losses.cross_entropy_loss import cross_entropy
        from ..losses.smooth_l1_loss import smooth_l1_loss

        featmap_sizes = [p.shape[1:3] for p in cls_scores]
        anchors, valid = self.get_anchors(featmap_sizes, pad_shapes)
        assigner = MaxIoUAssigner(**{k: v for k, v in train_cfg["assigner"].items()
                                     if k != "type"})
        t = anchor_target(anchors, valid, gt_bboxes, gt_valid, gt_labels,
                          img_shapes, assigner, self.target_means,
                          self.target_stds,
                          allowed_border=train_cfg.get("allowed_border", -1),
                          pos_weight=train_cfg.get("pos_weight", -1))
        num_anchors = self._num_anchors_per_level()
        cls_flat = self._flatten_levels_ssd(cls_scores, self.cls_out_channels,
                                            num_anchors)
        box_flat = self._flatten_levels_ssd(bbox_preds, 4, num_anchors)

        # per-anchor CE; hard-negative mining 3:1 per image, fixed shape
        ce = cross_entropy(cls_flat, t.labels, reduction="none")  # (B, A)
        pos = t.bbox_weights[..., 0] > 0
        neg = (t.label_weights > 0) & ~pos
        num_pos_img = jnp.sum(pos, axis=1)                         # (B,)
        k_neg = jnp.minimum(num_pos_img * self.neg_pos_ratio,
                            jnp.sum(neg, axis=1))

        neg_loss = jnp.where(neg, ce, -1.0)
        sorted_neg = jnp.sort(neg_loss, axis=1)[:, ::-1]           # desc
        thresh = jnp.take_along_axis(
            sorted_neg, jnp.clip(k_neg - 1, 0, neg_loss.shape[1] - 1)[:, None],
            axis=1)
        mined = neg & (neg_loss >= thresh) & (k_neg > 0)[:, None]

        num_pos = jnp.maximum(jnp.sum(num_pos_img), 1).astype(jnp.float32)
        loss_cls = jnp.sum(ce * (pos | mined)) / num_pos
        loss_bbox = smooth_l1_loss(box_flat, t.bbox_targets,
                                   weight=t.bbox_weights,
                                   avg_factor=num_pos, beta=self.smoothl1_beta)
        return dict(loss_cls=loss_cls, loss_bbox=loss_bbox)
