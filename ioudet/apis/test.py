"""Batched evaluation API (ref: tools/test.py (single_gpu_test,
multi_gpu_test, collect_results)).

The reference loops images one-by-one and gathers multi-GPU partial results
through the filesystem; here a fixed-shape batched predict runs under jit
(optionally sharded over the mesh) and results land on host as the standard
per-class numpy lists.  Multi-host merging uses process_allgather instead of
tmpdir + barrier.
"""

from __future__ import annotations

import time
from typing import Callable, List, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..core.bbox.transforms import bbox2result
from ..core.post_processing import merge_aug_bboxes, multiclass_nms
from ..data import build_dataloader
from ..utils.logging import get_root_logger


def make_predict_fn(detector, mesh=None):
    def predict(params, img, img_shape, scale_factor, pad_shape):
        return detector.apply({"params": params}, img, img_shape,
                              scale_factor, pad_shape,
                              method=detector.simple_test)

    if mesh is None:
        return jax.jit(predict)
    from jax.sharding import NamedSharding, PartitionSpec as P
    repl = NamedSharding(mesh, P())
    data = NamedSharding(mesh, P("data"))
    return jax.jit(predict, in_shardings=(repl, data, data, data, data),
                   out_shardings=(data, data))


def single_device_test(detector, params, dataset, imgs_per_batch: int = 8,
                       workers: int = 4, mesh=None,
                       progress: bool = True) -> List[List[np.ndarray]]:
    """Returns bbox2result-format detections aligned with dataset order."""
    logger = get_root_logger()
    loader = build_dataloader(dataset, imgs_per_batch, workers, shuffle=False,
                              drop_last=False)
    predict = make_predict_fn(detector, mesh)
    num_classes = detector.bbox_head.num_classes
    results: dict = {}
    n_done = 0
    t0 = time.time()
    pad_to = imgs_per_batch
    for batch in loader:
        img = batch["img"]
        bsz = img.shape[0]
        if bsz < pad_to:  # fixed-shape batch: pad the ragged tail
            reps = pad_to - bsz
            pad = lambda x: np.concatenate([x, np.repeat(x[-1:], reps, 0)])
            img = pad(img)
            batch = {k: (pad(v) if isinstance(v, np.ndarray) else v)
                     for k, v in batch.items()}
        dets, labels = predict(params, jnp.asarray(img),
                               jnp.asarray(batch["img_shape"]),
                               jnp.asarray(batch["scale_factor"]),
                               jnp.asarray(batch["pad_shape"]))
        dets = np.asarray(dets)
        labels = np.asarray(labels)
        for b in range(bsz):
            idx = int(batch["idx"][b])
            results[idx] = bbox2result(dets[b], labels[b], num_classes)
        n_done += bsz
        if progress and n_done % (20 * imgs_per_batch) == 0:
            rate = n_done / (time.time() - t0)
            logger.info(f"eval {n_done}/{len(dataset)} ({rate:.1f} img/s)")
    return [results[i] for i in sorted(results)]


def multi_host_test(detector, params, dataset, **kwargs):
    """Multi-host variant: each process evaluates its shard, then results are
    allgathered (ref: collect_results via tmpdir -> process_allgather)."""
    results = single_device_test(detector, params, dataset, **kwargs)
    if jax.process_count() == 1:
        return results
    from jax.experimental import multihost_utils
    gathered = multihost_utils.process_allgather(results)
    return gathered


def aug_test(detector, params, samples: List[dict], test_cfg) -> tuple:
    """Multi-scale/flip TTA for single-stage detectors.

    samples: per-view dicts from MultiScaleFlipAug (img, img_shape,
    scale_factor, pad_shape, flip).  Decoded per-view boxes are mapped back
    to original image space (merge_aug_bboxes semantics) and one NMS runs
    over the union.  The reference raised NotImplementedError for the
    single-stage family; this implements the documented two-stage merge.
    """
    aug_boxes, aug_scores, metas = [], [], []
    for s in samples:
        outs = detector.apply({"params": params},
                              jnp.asarray(s["img"])[None])
        head = detector.bbox_head
        boxes, scores = head.decode_candidates(
            *outs, jnp.asarray(s["img_shape"])[None],
            dict(test_cfg))
        aug_boxes.append(boxes[0])
        aug_scores.append(scores[0])
        metas.append(dict(img_shape=tuple(np.asarray(s["img_shape"])),
                          scale_factor=float(s["scale_factor"]),
                          flip=bool(s["flip"])))
    merged_boxes, merged_scores = merge_aug_bboxes(aug_boxes, aug_scores, metas)
    dets, labels = multiclass_nms(
        merged_boxes, merged_scores,
        score_thr=test_cfg.get("score_thr", 0.05),
        iou_thr=test_cfg.get("nms", {}).get("iou_thr", 0.5),
        max_per_img=test_cfg.get("max_per_img", 100))
    return np.asarray(dets), np.asarray(labels)


def tta_test(detector, params, dataset, test_cfg) -> List[List[np.ndarray]]:
    """Multi-scale/flip TTA evaluation: the dataset's test pipeline wraps
    MultiScaleFlipAug, so each __getitem__ yields a LIST of per-view samples;
    views are decoded, mapped back, merged, and NMSed per image (ref:
    tools/test.py --aug flow + merge_aug_bboxes)."""
    from ..core.bbox.transforms import bbox2result

    num_classes = detector.bbox_head.num_classes
    results = []
    for idx in range(len(dataset)):
        samples = dataset[idx]
        assert isinstance(samples, list), "pipeline must yield TTA views"
        dets, labels = aug_test(detector, params, samples, dict(test_cfg))
        results.append(bbox2result(dets, labels, num_classes))
    return results


def make_eval_hook(val_dataset, cfg, imgs_per_batch: int = 8) -> Callable:
    def hook(detector, params):
        results = single_device_test(detector, params, val_dataset,
                                     imgs_per_batch=imgs_per_batch)
        if hasattr(val_dataset, "evaluate"):
            return val_dataset.evaluate(results)
        return {}

    return hook


def make_proposal_recall_hook(val_dataset, proposal_nums=(100, 300, 1000),
                              iou_thrs=(0.5,), imgs_per_batch: int = 8
                              ) -> Callable:
    """AR@N eval for proposal models (ref: CocoDistEvalRecallHook /
    fast_eval_recall): runs the RPN's simple_test and scores recall of the
    kept proposals against gt boxes."""
    from ..core.evaluation import eval_recalls

    def hook(detector, params):
        results = single_device_test(detector, params, val_dataset,
                                     imgs_per_batch=imgs_per_batch,
                                     progress=False)
        gts, props = [], []
        for i in range(len(val_dataset)):
            ann = val_dataset.get_ann_info(i)
            gts.append(ann["bboxes"])
            dets = np.concatenate(results[i]) if len(results[i]) else \
                np.zeros((0, 5), np.float32)
            props.append(dets)
        recalls = eval_recalls(gts, props, proposal_nums, iou_thrs)
        return {f"AR@{n}": float(recalls[i, 0])
                for i, n in enumerate(proposal_nums)}

    return hook
