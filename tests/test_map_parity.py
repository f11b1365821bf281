"""End-to-end mAP-parity harness vs an independent torch twin (VERDICT r2
item 2 — "the only accuracy proof this sandbox permits").

Construction: a synthetic COCO dataset (varied original sizes, so
scale_factor != 1 exercises the rescale path) is evaluated by OUR full
pipeline (host pipeline -> jit simple_test -> bbox2result -> COCOeval).
The detections themselves are then written back as the dataset's ground
truth, making our mAP ~1.0 BY CONSTRUCTION.  An INDEPENDENT torch
implementation of the reference pipeline (twin ResNet18+FPN+IoU-aware head
from test_full_detector_parity + a from-scratch torch/numpy
decode->rescore->NMS written to mmdet v1 semantics: per-level topk on raw
cls scores, delta2bbox with +1 conventions, rescale BEFORE NMS, per-class
greedy NMS at +1 IoU, max_per_img score cap) then runs the same images with
the SAME weights; its mAP against that ground truth must match ours within
0.2 AP (it measures any decode/convention drift directly as AP loss).

Ref: mmdet/models/anchor_heads/anchor_head.py (get_bboxes_single),
mmdet/core/post_processing/bbox_nms.py (multiclass_nms),
mmdet/core/bbox/transforms.py (delta2bbox), fork's rescoring S=p^a*IoU^(1-a).
"""

import json

import numpy as np
import pytest
import torch
import torch.nn as tnn

from tests.test_full_detector_parity import TorchDetector

N_CLASSES = 5  # 4 foreground categories (sigmoid head: C' = 4)
ALPHA = 0.5
TEST_CFG = dict(nms_pre=200, score_thr=0.05, nms=dict(iou_thr=0.5),
                max_per_img=40, rescoring_alpha=ALPHA)


# ------------------------------------------------------- torch-side pipeline

def _torch_delta2bbox(anchors, deltas, img_shape):
    """Independent torch derivation of mmdet delta2bbox (means 0, stds 1,
    +1 size convention, wh_ratio_clip=16/1000, clip to img_shape-1)."""
    pw = anchors[:, 2] - anchors[:, 0] + 1.0
    ph = anchors[:, 3] - anchors[:, 1] + 1.0
    px = (anchors[:, 0] + anchors[:, 2]) * 0.5
    py = (anchors[:, 1] + anchors[:, 3]) * 0.5
    mr = abs(np.log(16.0 / 1000.0))
    dx, dy = deltas[:, 0], deltas[:, 1]
    dw = deltas[:, 2].clamp(-mr, mr)
    dh = deltas[:, 3].clamp(-mr, mr)
    gw = pw * dw.exp()
    gh = ph * dh.exp()
    gx = px + pw * dx
    gy = py + ph * dy
    x1 = (gx - gw * 0.5 + 0.5).clamp(0, img_shape[1] - 1)
    y1 = (gy - gh * 0.5 + 0.5).clamp(0, img_shape[0] - 1)
    x2 = (gx + gw * 0.5 - 0.5).clamp(0, img_shape[1] - 1)
    y2 = (gy + gh * 0.5 - 0.5).clamp(0, img_shape[0] - 1)
    return torch.stack([x1, y1, x2, y2], dim=-1)


def _np_greedy_nms(boxes, scores, iou_thr):
    """+1-convention greedy NMS, score-descending (stable)."""
    order = np.argsort(-scores, kind="stable")
    keep = []
    suppressed = np.zeros(len(scores), bool)
    for i in order:
        if suppressed[i]:
            continue
        keep.append(i)
        bi = boxes[i]
        for j in order:
            if suppressed[j] or j == i:
                continue
            iw = min(bi[2], boxes[j, 2]) - max(bi[0], boxes[j, 0]) + 1
            ih = min(bi[3], boxes[j, 3]) - max(bi[1], boxes[j, 1]) + 1
            inter = max(iw, 0.0) * max(ih, 0.0)
            a1 = (bi[2] - bi[0] + 1) * (bi[3] - bi[1] + 1)
            a2 = (boxes[j, 2] - boxes[j, 0] + 1) * \
                (boxes[j, 3] - boxes[j, 1] + 1)
            if inter / (a1 + a2 - inter) > iou_thr:
                suppressed[j] = True
    return keep


def torch_reference_pipeline(t_cls, t_reg, t_iou, anchors_per_level,
                             img_shape, scale_factor, cfg=TEST_CFG):
    """mmdet v1 get_bboxes + multiclass_nms semantics, torch/numpy.

    Returns bbox2result format: per-class list of (n, 5) float32 arrays in
    ORIGINAL-image coordinates."""
    nms_pre = cfg["nms_pre"]
    cand_boxes, cand_scores, cand_iou = [], [], []
    for cls, reg, iou, anchors in zip(t_cls, t_reg, t_iou, anchors_per_level):
        # (A*C', H, W) -> (H*W*A, C')
        c_out = cls.shape[0] // 9
        p = cls.permute(1, 2, 0).reshape(-1, c_out).sigmoid()
        q = iou.permute(1, 2, 0).reshape(-1).sigmoid()
        d = reg.permute(1, 2, 0).reshape(-1, 4)
        anchors = torch.from_numpy(anchors).float()
        if p.shape[0] > nms_pre:
            maxs, _ = p.max(dim=1)
            _, idx = maxs.topk(nms_pre)  # reference: topk on RAW cls scores
            p, q, d, anchors = p[idx], q[idx], d[idx], anchors[idx]
        boxes = _torch_delta2bbox(anchors, d, img_shape)
        cand_boxes.append(boxes)
        cand_scores.append(p)
        cand_iou.append(q)
    boxes = torch.cat(cand_boxes).numpy()
    p = torch.cat(cand_scores).numpy()
    q = torch.cat(cand_iou).numpy()
    # fork rescoring S = p^a * IoU^(1-a), then rescale BEFORE NMS
    scores = np.maximum(p, 1e-6) ** ALPHA * \
        (np.maximum(q, 1e-6) ** (1 - ALPHA))[:, None]
    boxes = boxes / scale_factor

    # multiclass_nms: per-class threshold + NMS, global max_per_img cap
    dets_all = []
    for c in range(scores.shape[1]):
        m = scores[:, c] > cfg["score_thr"]
        if not m.any():
            dets_all.append(np.zeros((0, 5), np.float32))
            continue
        b, s = boxes[m], scores[m, c]
        keep = _np_greedy_nms(b, s, cfg["nms"]["iou_thr"])
        dets_all.append(
            np.concatenate([b[keep], s[keep, None]], axis=1).astype(
                np.float32))
    all_scores = np.concatenate([d[:, 4] for d in dets_all])
    if len(all_scores) > cfg["max_per_img"]:
        thr = np.sort(all_scores)[::-1][cfg["max_per_img"] - 1]
        dets_all = [d[d[:, 4] >= thr] for d in dets_all]
    return dets_all


# ------------------------------------------------------------------ fixtures

def _make_twin():
    """Torch twin with biases shaped so random weights yield a usable score
    distribution (cls logits around -1.5, iou logits spread around 0)."""
    torch.manual_seed(11)
    m = TorchDetector()
    with torch.no_grad():
        for mod in m.modules():
            if isinstance(mod, tnn.BatchNorm2d):
                mod.running_mean.uniform_(-0.5, 0.5)
                mod.running_var.uniform_(0.5, 2.0)
                mod.weight.uniform_(0.5, 1.5)
                mod.bias.uniform_(-0.5, 0.5)
            elif isinstance(mod, tnn.Conv2d):
                mod.weight.mul_(0.3)
        m.bbox_head.retina_cls.bias.normal_(-1.5, 1.0)
        m.bbox_head.retina_iou.bias.normal_(0.0, 1.0)
        m.bbox_head.retina_reg.bias.normal_(0.0, 0.05)
        # amplify the prediction convs so scores/boxes vary with CONTENT:
        # bias-dominated logits produce massive score ties, and tie-breaking
        # order is implementation-defined — that would measure sort
        # stability, not pipeline parity
        m.bbox_head.retina_cls.weight.mul_(8.0)
        m.bbox_head.retina_iou.weight.mul_(8.0)
        m.bbox_head.retina_reg.weight.mul_(4.0)
    m.eval()
    return m


@pytest.fixture(scope="module")
def coco_imgs(tmp_path_factory):
    """Noise images at VARIED original sizes (different scale_factors)."""
    tmp = tmp_path_factory.mktemp("map_parity")
    rng = np.random.default_rng(5)
    from PIL import Image
    img_dir = tmp / "imgs"
    img_dir.mkdir()
    sizes = [(100, 150), (80, 120), (60, 90), (64, 64), (120, 180),
             (40, 60)] * 4  # 24 images, (h, w)
    images = []
    for i, (h, w) in enumerate(sizes):
        arr = rng.integers(0, 255, (h, w, 3), np.uint8)
        Image.fromarray(arr).save(img_dir / f"{i}.png")
        images.append(dict(id=i, file_name=f"{i}.png", width=w, height=h))
    return tmp, str(img_dir), images


def _make_dataset(ann_path, img_dir):
    from ioudet.data import build_dataset
    pipe = [
        dict(type="LoadImageFromFile"),
        dict(type="Resize", img_scale=(96, 64), keep_ratio=True),
        dict(type="Normalize", mean=(127.0, 127.0, 127.0),
             std=(60.0, 60.0, 60.0), to_rgb=True),
        dict(type="Pad", size_divisor=32, size=(64, 96)),
        dict(type="Collect", keys=["img"]),
    ]
    return build_dataset(dict(type="CocoDataset", ann_file=ann_path,
                              img_prefix=img_dir, pipeline=pipe,
                              test_mode=True))


def _write_ann(path, images, annotations):
    path.write_text(json.dumps(dict(
        images=images, annotations=annotations,
        categories=[dict(id=c + 1, name=f"c{c}")
                    for c in range(N_CLASSES - 1)])))


def test_map_parity(coco_imgs):
    import jax.numpy as jnp
    from ioudet.apis import single_device_test
    from ioudet.apis.checkpoint import convert_torch_retinanet
    from ioudet.models import build_detector

    twin_model = _make_twin()
    tmp, img_dir, images = coco_imgs

    cfg = dict(
        type="IoUAwareRetinaNet",
        backbone=dict(type="ResNet", depth=18, frozen_stages=-1,
                      norm_cfg=dict(type="FrozenBN")),
        neck=dict(type="FPN", in_channels=[64, 128, 256, 512],
                  out_channels=64, start_level=1, add_extra_convs=True,
                  num_outs=5),
        bbox_head=dict(type="IoUAwareRetinaHead", num_classes=N_CLASSES,
                       in_channels=64, feat_channels=64, stacked_convs=2,
                       octave_base_scale=4, scales_per_octave=3,
                       anchor_ratios=(0.5, 1.0, 2.0),
                       anchor_strides=(8, 16, 32, 64, 128)))
    det = build_detector(cfg, None, dict(TEST_CFG))
    params = convert_torch_retinanet(twin_model.state_dict(), depth=18,
                                     num_laterals=3, stacked_convs=2)

    # ---- pass 1: OUR pipeline on an annotation-less dataset --------------
    ann0 = tmp / "ann_empty.json"
    _write_ann(ann0, images, [])
    ds = _make_dataset(str(ann0), img_dir)
    results = single_device_test(det, params, ds, imgs_per_batch=4,
                                 workers=1, progress=False)
    assert len(results) == len(images)

    # ---- derive ground truth from our detections -------------------------
    annotations, ann_id = [], 0
    GT_THR = 0.18
    for img_id, per_class in enumerate(results):
        for c, dets in enumerate(per_class):
            for d in dets:
                if d[4] < GT_THR:
                    continue
                x1, y1, x2, y2 = map(float, d[:4])
                w, h = x2 - x1 + 1, y2 - y1 + 1
                annotations.append(dict(
                    id=ann_id, image_id=img_id, category_id=c + 1,
                    bbox=[x1, y1, w, h], area=w * h, iscrowd=0))
                ann_id += 1
    # the harness is vacuous unless the GT is substantial and multi-class
    assert ann_id >= 2 * len(images), f"only {ann_id} GT boxes"
    assert len({a["category_id"] for a in annotations}) >= 2

    ann1 = tmp / "ann_gt.json"
    _write_ann(ann1, images, annotations)
    val = _make_dataset(str(ann1), img_dir)
    metrics_ours = val.evaluate(results)
    # detections == GT (plus sub-threshold tails ranked below) -> AP ~ 1
    assert metrics_ours["AP"] > 0.95, metrics_ours

    # ---- pass 2: INDEPENDENT torch pipeline on the same batches ----------
    from ioudet.data import build_dataloader
    head = det.bbox_head
    torch_results = {}
    loader = build_dataloader(val, 1, 1, shuffle=False, drop_last=False)
    for batch in loader:
        idx = int(batch["idx"][0])
        img = batch["img"]  # (1, H, W, 3) normalized, padded
        x = torch.from_numpy(np.transpose(img, (0, 3, 1, 2)).copy())
        with torch.no_grad():
            t_cls, t_reg, t_iou = twin_model(x)
        featmaps = [(c.shape[2], c.shape[3]) for c in t_cls]
        anchors = [np.asarray(g.grid_anchors(fs, st), np.float32)
                   for g, fs, st in zip(head.anchor_generators(), featmaps,
                                        head.anchor_strides)]
        img_shape = tuple(int(v) for v in batch["img_shape"][0][:2])
        sf = float(batch["scale_factor"][0])
        torch_results[idx] = torch_reference_pipeline(
            [t[0] for t in t_cls], [t[0] for t in t_reg],
            [t[0] for t in t_iou], anchors, img_shape, sf)
    torch_list = [torch_results[i] for i in sorted(torch_results)]
    metrics_torch = val.evaluate(torch_list)

    delta = abs(metrics_ours["AP"] - metrics_torch["AP"])
    print(f"\nmAP ours={metrics_ours['AP']:.4f} "
          f"torch={metrics_torch['AP']:.4f} delta={delta:.4f}")
    assert delta < 0.2, (metrics_ours, metrics_torch)
    # the pipelines should in fact be the same function, not merely close
    assert delta < 0.02, (metrics_ours, metrics_torch)
    assert abs(metrics_ours["AP50"] - metrics_torch["AP50"]) < 0.02

    # ---- rescoring-order ablation (VERDICT r2 item 3) -------------------
    # NOTE this harness's GT is BY CONSTRUCTION the default-ordering output,
    # so the opt-in ordering is penalized for every candidate-selection
    # difference — the number below measures how much the orderings diverge
    # on an untrained model (lots: random logits have no cls/IoU agreement),
    # not accuracy.  The accuracy-equivalence claim on a TRAINED model lives
    # in test_convergence_map.py (both orderings > 0.8 AP50 after training).
    det_b = build_detector(cfg, None,
                           dict(TEST_CFG, rescore_before_topk=True))
    results_b = single_device_test(det_b, params, val, imgs_per_batch=4,
                                   workers=1, progress=False)
    metrics_b = val.evaluate(results_b)
    print(f"rescore_before_topk=True AP={metrics_b['AP']:.4f} "
          f"(reference ordering AP={metrics_ours['AP']:.4f})")
    assert np.isfinite(metrics_b["AP"])
    # and the orderings do genuinely differ on random logits (the switch is
    # not a no-op)
    assert metrics_b["AP"] < metrics_ours["AP"]
