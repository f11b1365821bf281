"""End-to-end integration: synthetic COCO dataset -> train_detector (runner,
checkpointing, logging, eval hook) -> auto-resume -> single_device_test ->
dataset.evaluate -> inference_detector.  The full user journey on the CPU
mesh with a tiny model."""

import json
import os

import numpy as np
import pytest


@pytest.fixture(scope="module")
def synthetic_coco(tmp_path_factory):
    tmp_path = tmp_path_factory.mktemp("coco")
    rng = np.random.default_rng(0)
    from PIL import Image
    images, annotations = [], []
    img_dir = tmp_path / "imgs"
    img_dir.mkdir()
    ann_id = 0
    for i in range(8):
        w, h = 96, 64
        arr = rng.integers(0, 255, (h, w, 3), np.uint8)
        # draw a bright box so there is signal
        x, y, bw, bh = 20, 15, 30, 25
        arr[y:y + bh, x:x + bw] = [255, 0, 0]
        Image.fromarray(arr).save(img_dir / f"{i}.jpg")
        images.append(dict(id=i, file_name=f"{i}.jpg", width=w, height=h))
        annotations.append(dict(id=ann_id, image_id=i, category_id=1,
                                bbox=[x, y, bw, bh], area=bw * bh, iscrowd=0))
        ann_id += 1
    ann = tmp_path / "ann.json"
    ann.write_text(json.dumps(dict(images=images, annotations=annotations,
                                   categories=[dict(id=1, name="thing")])))
    return str(ann), str(img_dir)


def make_cfg(ann_file, img_dir, work_dir):
    from ioudet.utils.config import Config

    pipeline_train = [
        dict(type="LoadImageFromFile"),
        dict(type="LoadAnnotations", with_bbox=True),
        dict(type="Resize", img_scale=(96, 64), keep_ratio=True),
        dict(type="RandomFlip", flip_ratio=0.5),
        dict(type="Normalize", mean=(123.675, 116.28, 103.53),
             std=(58.395, 57.12, 57.375), to_rgb=False),
        dict(type="Pad", size_divisor=32, size=(64, 96)),
        dict(type="DefaultFormatBundle", max_gt=5),
        dict(type="Collect", keys=["img", "gt_bboxes", "gt_labels",
                                   "gt_valid"]),
    ]
    pipeline_test = [
        dict(type="LoadImageFromFile"),
        dict(type="Resize", img_scale=(96, 64), keep_ratio=True),
        dict(type="Normalize", mean=(123.675, 116.28, 103.53),
             std=(58.395, 57.12, 57.375), to_rgb=False),
        dict(type="Pad", size_divisor=32, size=(64, 96)),
        dict(type="Collect", keys=["img"]),
    ]
    return Config.fromdict(dict(
        model=dict(
            type="IoUAwareRetinaNet",
            backbone=dict(type="ResNet", depth=18, frozen_stages=-1,
                          norm_cfg=dict(type="FrozenBN")),
            neck=dict(type="FPN", in_channels=[64, 128, 256, 512],
                      out_channels=32, start_level=1, add_extra_convs=True,
                      num_outs=5),
            bbox_head=dict(type="IoUAwareRetinaHead", num_classes=2,
                           in_channels=32, feat_channels=32, stacked_convs=1,
                           anchor_strides=(8, 16, 32, 64, 128),
                           loss_cls=dict(type="FocalLoss", use_sigmoid=True,
                                         gamma=2.0, alpha=0.25,
                                         loss_weight=1.0),
                           loss_bbox=dict(type="SmoothL1Loss", beta=0.11,
                                          loss_weight=1.0))),
        train_cfg=dict(assigner=dict(type="MaxIoUAssigner", pos_iou_thr=0.5,
                                     neg_iou_thr=0.4, min_pos_iou=0,
                                     ignore_iof_thr=-1),
                       allowed_border=-1, pos_weight=-1),
        test_cfg=dict(nms_pre=100, score_thr=0.05, nms=dict(iou_thr=0.5),
                      max_per_img=10, rescoring_alpha=0.5),
        data=dict(imgs_per_gpu=1, workers_per_gpu=1,
                  train=dict(type="CocoDataset", ann_file=ann_file,
                             img_prefix=img_dir, pipeline=pipeline_train),
                  val=dict(type="CocoDataset", ann_file=ann_file,
                           img_prefix=img_dir, pipeline=pipeline_test,
                           test_mode=True),
                  test=dict(type="CocoDataset", ann_file=ann_file,
                            img_prefix=img_dir, pipeline=pipeline_test,
                            test_mode=True)),
        optimizer=dict(type="SGD", lr=0.002, momentum=0.9,
                       weight_decay=0.0001),
        optimizer_config=dict(grad_clip=dict(max_norm=35)),
        lr_config=dict(policy="step", warmup=None, step=[100]),
        checkpoint_config=dict(interval=1),
        log_config=dict(interval=1),
        total_epochs=2,
        work_dir=work_dir,
    ))


class TestEndToEnd:
    def test_train_eval_resume(self, synthetic_coco, tmp_path):
        import jax
        from ioudet.apis import train_detector, single_device_test
        from ioudet.apis.checkpoint import latest_checkpoint
        from ioudet.data import build_dataset
        from ioudet.models import build_detector

        ann_file, img_dir = synthetic_coco
        work_dir = str(tmp_path / "work")
        cfg = make_cfg(ann_file, img_dir, work_dir)
        det = build_detector(dict(cfg.model), cfg.get("train_cfg"),
                             cfg.get("test_cfg"))
        dataset = build_dataset(cfg.data["train"])
        assert len(dataset) == 8

        state = train_detector(det, dataset, cfg, work_dir, n_devices=2)
        assert int(jax.device_get(state["step"])) == 2 * 4  # 2 epochs x 4 iters
        # checkpoints + logs written
        assert latest_checkpoint(work_dir).endswith("epoch_2")
        log = [json.loads(l) for l in open(os.path.join(work_dir, "log.json"))]
        assert any(r["mode"] == "train" for r in log)

        # resume is a no-op when already at total_epochs
        state2 = train_detector(det, dataset, cfg, work_dir, n_devices=2)
        assert int(jax.device_get(state2["step"])) == 8

        # batched eval over the dataset + COCO metrics
        val = build_dataset(cfg.data["val"])
        params = jax.device_get(state["params"]) if "params" in state else None
        import jax.numpy as jnp
        params = jax.tree.map(jnp.asarray, state["params"])
        results = single_device_test(det, params, val, imgs_per_batch=4,
                                     progress=False)
        assert len(results) == 8
        metrics = val.evaluate(results)
        assert "AP" in metrics and np.isfinite(metrics["AP"])

    def test_inference_detector(self, synthetic_coco, tmp_path):
        from ioudet.apis import init_detector, inference_detector, show_result

        ann_file, img_dir = synthetic_coco
        cfg = make_cfg(ann_file, img_dir, str(tmp_path / "w2"))
        handle = init_detector(cfg, checkpoint=None)
        img_path = os.path.join(img_dir, "0.jpg")
        result = inference_detector(handle, img_path)
        assert len(result) == 1  # num_classes - 1
        assert result[0].shape[1] == 5
        out = show_result(img_path, result, ("thing",), score_thr=0.0,
                          out_file=str(tmp_path / "vis.jpg"))
        assert out.shape[-1] == 3
        assert os.path.exists(tmp_path / "vis.jpg")
