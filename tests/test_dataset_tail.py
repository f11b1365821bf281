"""End-to-end coverage for the dataset tail (VERDICT r3 weak #7 / next #7):
WIDERFaceDataset and CityscapesDataset each go load -> pipeline -> loader ->
one train step -> batched eval -> dataset.evaluate on synthetic trees, and
tools/test.py --show writes annotated images.

WIDER uses the REAL ssd300_wider_face data pipeline (PhotoMetricDistortion /
Expand / MinIoURandomCrop / fixed 300x300) with only the paths overridden;
the detector is the tiny RetinaNet used across the suite — SSD300-VGG16
itself is covered by test_ssd_vgg_parity + the config build test, and a tiny
head keeps this a CPU-minutes test (the dataset/pipeline is what was
untested).  Ref: mmdet/datasets/wider_face.py (WIDERFaceDataset — filename
comes from the xml <folder> tag), mmdet/datasets/cityscapes.py,
tools/test.py (single_gpu_test show=True).
"""

import json
import os
import sys
import xml.etree.ElementTree as ET

import numpy as np
import pytest

import jax
import jax.numpy as jnp

CITYSCAPES_8 = ("person", "rider", "car", "truck", "bus", "train",
                "motorcycle", "bicycle")


def tiny_detector(num_classes):
    from ioudet.models import build_detector

    cfg = dict(
        type="IoUAwareRetinaNet",
        backbone=dict(type="ResNet", depth=18, frozen_stages=-1,
                      norm_cfg=dict(type="FrozenBN")),
        neck=dict(type="FPN", in_channels=[64, 128, 256, 512],
                  out_channels=32, start_level=1, add_extra_convs=True,
                  num_outs=5),
        bbox_head=dict(type="IoUAwareRetinaHead", num_classes=num_classes,
                       in_channels=32, feat_channels=32, stacked_convs=1,
                       anchor_strides=(8, 16, 32, 64, 128),
                       loss_cls=dict(type="FocalLoss", use_sigmoid=True,
                                     gamma=2.0, alpha=0.25, loss_weight=1.0),
                       loss_bbox=dict(type="SmoothL1Loss", beta=0.11,
                                      loss_weight=1.0)))
    train_cfg = dict(assigner=dict(type="MaxIoUAssigner", pos_iou_thr=0.5,
                                   neg_iou_thr=0.4, min_pos_iou=0,
                                   ignore_iof_thr=-1),
                     allowed_border=-1, pos_weight=-1)
    test_cfg = dict(nms_pre=100, score_thr=0.05, nms=dict(iou_thr=0.5),
                    max_per_img=10, rescoring_alpha=0.5)
    return build_detector(cfg, train_cfg, test_cfg)


def run_one_train_step(det, dataset, batch_size=2):
    from ioudet.apis.train import build_optimizer, make_train_step
    from ioudet.data import build_dataloader

    loader = build_dataloader(dataset, imgs_per_gpu=batch_size,
                              workers_per_gpu=1, shuffle=False,
                              drop_last=False)
    batch = next(iter(loader))
    keep = ("img", "gt_bboxes", "gt_labels", "gt_valid", "img_shape",
            "pad_shape")
    batch = {k: jnp.asarray(v) for k, v in batch.items() if k in keep}
    params = det.init(jax.random.PRNGKey(0), batch["img"][:1])["params"]
    tx = build_optimizer(dict(type="SGD", lr=0.01, momentum=0.9),
                         lambda s: 0.01)
    state = dict(params=params, opt_state=tx.init(params),
                 step=jnp.zeros((), jnp.int32))
    step_fn = make_train_step(det, tx)
    state, logs = step_fn(state, batch)
    assert np.isfinite(float(logs["loss"])), logs
    return state["params"]


# --------------------------------------------------------------- WIDER Face
@pytest.fixture(scope="module")
def wider_tree(tmp_path_factory):
    """WIDER_train-style tree: Annotations/*.xml + <event folder>/*.jpg,
    ids listed in train.txt (the reference's directory contract)."""
    from PIL import Image

    root = tmp_path_factory.mktemp("wider")
    prefix = root / "WIDER_train"
    (prefix / "Annotations").mkdir(parents=True)
    (prefix / "0--Parade").mkdir()
    rng = np.random.default_rng(0)
    ids = []
    for i in range(4):
        img_id = f"0_Parade_marchingband_1_{i}"
        w, h = 128, 96
        arr = rng.integers(0, 255, (h, w, 3), np.uint8)
        x, y, bw, bh = 30 + 6 * i, 20, 34, 30
        arr[y:y + bh, x:x + bw] = [250, 180, 160]
        Image.fromarray(arr).save(prefix / "0--Parade" / f"{img_id}.jpg")
        xml = ET.Element("annotation")
        ET.SubElement(xml, "folder").text = "0--Parade"
        size = ET.SubElement(xml, "size")
        ET.SubElement(size, "width").text = str(w)
        ET.SubElement(size, "height").text = str(h)
        obj = ET.SubElement(xml, "object")
        ET.SubElement(obj, "name").text = "face"
        ET.SubElement(obj, "difficult").text = "0"
        bb = ET.SubElement(obj, "bndbox")
        for tag, v in zip(("xmin", "ymin", "xmax", "ymax"),
                          (x, y, x + bw, y + bh)):
            ET.SubElement(bb, tag).text = str(v)
        ET.ElementTree(xml).write(prefix / "Annotations" / f"{img_id}.xml")
        ids.append(img_id)
    (root / "train.txt").write_text("\n".join(ids) + "\n")
    return str(root / "train.txt"), str(prefix)


class TestWIDERFaceEndToEnd:
    def test_load_train_eval(self, wider_tree):
        from ioudet.data import build_dataset
        from ioudet.utils.config import Config
        from ioudet.apis.test import single_device_test

        ann_file, prefix = wider_tree
        cfg = Config.fromfile("configs/ssd300_wider_face.py")
        train_d = dict(cfg.data["train"])
        train_d.update(ann_file=ann_file, img_prefix=prefix, min_size=5)
        dataset = build_dataset(train_d)
        assert len(dataset) == 4
        info = dataset.img_infos[0]
        assert info["filename"].startswith("0--Parade/")  # <folder> honored
        ann = dataset.get_ann_info(0)
        assert ann["bboxes"].shape == (1, 4) and ann["labels"][0] == 1

        det = tiny_detector(num_classes=2)
        params = run_one_train_step(det, dataset)

        test_d = dict(cfg.data["test"])
        test_d.update(ann_file=ann_file, img_prefix=prefix, test_mode=True)
        val = build_dataset(test_d)
        results = single_device_test(det, params, val, imgs_per_batch=2,
                                     workers=1, progress=False)
        assert len(results) == 4 and len(results[0]) == 1  # 1 class: face
        metrics = val.evaluate(results)
        assert np.isfinite(metrics["mAP"])


# --------------------------------------------------------------- Cityscapes
@pytest.fixture(scope="module")
def cityscapes_tree(tmp_path_factory):
    """instancesonly_filtered_gtFine-style COCO json over the 8 cityscapes
    categories + a leftImg8bit-style image dir."""
    from PIL import Image

    root = tmp_path_factory.mktemp("cityscapes")
    img_dir = root / "leftImg8bit" / "train"
    img_dir.mkdir(parents=True)
    rng = np.random.default_rng(1)
    images, annotations = [], []
    ann_id = 0
    for i in range(4):
        w, h = 128, 96
        arr = rng.integers(0, 255, (h, w, 3), np.uint8)
        x, y, bw, bh = 25 + 5 * i, 18, 36, 30
        arr[y:y + bh, x:x + bw] = [40, 40, 220]
        name = f"city_{i:06d}_leftImg8bit.png"
        Image.fromarray(arr).save(img_dir / name)
        images.append(dict(id=i, file_name=name, width=w, height=h))
        annotations.append(dict(id=ann_id, image_id=i,
                                category_id=(i % 8) + 1,
                                bbox=[x, y, bw, bh], area=bw * bh,
                                iscrowd=0))
        ann_id += 1
    categories = [dict(id=c + 1, name=n) for c, n in enumerate(CITYSCAPES_8)]
    ann = root / "instancesonly_filtered_gtFine_train.json"
    ann.write_text(json.dumps(dict(images=images, annotations=annotations,
                                   categories=categories)))
    return str(ann), str(img_dir)


def cityscapes_pipelines():
    norm = dict(type="Normalize", mean=(123.675, 116.28, 103.53),
                std=(58.395, 57.12, 57.375), to_rgb=True)
    train = [
        dict(type="LoadImageFromFile"),
        dict(type="LoadAnnotations", with_bbox=True),
        dict(type="Resize", img_scale=(128, 96), keep_ratio=True),
        dict(type="RandomFlip", flip_ratio=0.5),
        norm,
        dict(type="Pad", size_divisor=32, size=(96, 128)),
        dict(type="DefaultFormatBundle", max_gt=5),
        dict(type="Collect", keys=["img", "gt_bboxes", "gt_labels",
                                   "gt_valid"]),
    ]
    test = [
        dict(type="LoadImageFromFile"),
        dict(type="Resize", img_scale=(128, 96), keep_ratio=True),
        norm,
        dict(type="Pad", size_divisor=32, size=(96, 128)),
        dict(type="Collect", keys=["img"]),
    ]
    return train, test


class TestCityscapesEndToEnd:
    def test_load_train_eval(self, cityscapes_tree):
        from ioudet.data import build_dataset
        from ioudet.apis.test import single_device_test

        ann_file, img_dir = cityscapes_tree
        train_pipe, test_pipe = cityscapes_pipelines()
        dataset = build_dataset(dict(type="CityscapesDataset",
                                     ann_file=ann_file, img_prefix=img_dir,
                                     pipeline=train_pipe))
        assert len(dataset) == 4
        assert dataset.CLASSES == CITYSCAPES_8

        det = tiny_detector(num_classes=9)
        params = run_one_train_step(det, dataset)

        val = build_dataset(dict(type="CityscapesDataset", ann_file=ann_file,
                                 img_prefix=img_dir, pipeline=test_pipe,
                                 test_mode=True))
        results = single_device_test(det, params, val, imgs_per_batch=2,
                                     workers=1, progress=False)
        assert len(results) == 4 and len(results[0]) == 8
        metrics = val.evaluate(results)
        assert "AP" in metrics and np.isfinite(metrics["AP"])


# --------------------------------------------------------------- --show
class TestShowTool:
    def test_show_writes_annotated_images(self, cityscapes_tree, tmp_path,
                                          monkeypatch):
        """tools/test.py --show writes one annotated image per dataset entry
        (ref: tools/test.py (single_gpu_test --show); headless -> files)."""
        ann_file, img_dir = cityscapes_tree
        _, test_pipe = cityscapes_pipelines()
        cfg_py = tmp_path / "show_cfg.py"
        cfg_py.write_text(
            "model = dict(\n"
            "    type='IoUAwareRetinaNet',\n"
            "    backbone=dict(type='ResNet', depth=18, frozen_stages=-1,\n"
            "                  norm_cfg=dict(type='FrozenBN')),\n"
            "    neck=dict(type='FPN', in_channels=[64, 128, 256, 512],\n"
            "              out_channels=32, start_level=1,\n"
            "              add_extra_convs=True, num_outs=5),\n"
            "    bbox_head=dict(type='IoUAwareRetinaHead', num_classes=9,\n"
            "                   in_channels=32, feat_channels=32,\n"
            "                   stacked_convs=1,\n"
            "                   anchor_strides=(8, 16, 32, 64, 128)))\n"
            "test_cfg = dict(nms_pre=100, score_thr=0.05,\n"
            "                nms=dict(iou_thr=0.5), max_per_img=10,\n"
            "                rescoring_alpha=0.5)\n"
            f"data = dict(test=dict(type='CityscapesDataset',\n"
            f"                      ann_file={ann_file!r},\n"
            f"                      img_prefix={img_dir!r},\n"
            f"                      test_mode=True,\n"
            f"                      pipeline={test_pipe!r}))\n")
        show_dir = tmp_path / "shown"
        import importlib.util
        spec = importlib.util.spec_from_file_location(
            "ioudet_tools_test", os.path.join("tools", "test.py"))
        mod = importlib.util.module_from_spec(spec)
        monkeypatch.setattr(sys, "argv", [
            "test.py", str(cfg_py), "--show", "--show-dir", str(show_dir),
            "--show-score-thr", "0.0", "--batch", "2"])
        spec.loader.exec_module(mod)
        mod.main()
        written = sorted(os.listdir(show_dir))
        assert len(written) == 4
        from PIL import Image
        im = Image.open(show_dir / written[0])
        assert im.size == (128, 96)
