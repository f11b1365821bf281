"""Data pipeline: resize math (mmcv imrescale parity), flip, pad/canvas,
format bundle, collate, synthetic COCO dataset round trip."""

import json
import os

import numpy as np
import pytest

from ioudet.data import build_dataset, collate, GroupedBatchSampler
from ioudet.data.pipelines.compose import Compose
from ioudet.data.pipelines.transforms import (Resize, RandomFlip, Normalize,
                                              Pad, imrescale_size)
from ioudet.data.pipelines.formatting import DefaultFormatBundle, Collect


class TestResize:
    def test_imrescale_sizing(self):
        # 480x640 into (1333, 800): factor = min(1333/640, 800/480) = 5/3
        nh, nw, f = imrescale_size(480, 640, (1333, 800))
        assert abs(f - 800 / 480) < 1e-9
        assert nh == 800 and nw == int(640 * f + 0.5)

    def test_long_edge_binds(self):
        # very wide image: long edge limits
        nh, nw, f = imrescale_size(200, 2000, (1333, 800))
        assert abs(f - 1333 / 2000) < 1e-9

    def test_resize_scales_boxes(self):
        img = np.zeros((100, 200, 3), np.uint8)
        r = Resize(img_scale=(400, 200))
        results = dict(img=img, img_shape=(100, 200),
                       gt_bboxes=np.array([[10, 10, 50, 50]], np.float32))
        out = r(results)
        f = out["scale_factor"]
        np.testing.assert_allclose(out["gt_bboxes"],
                                   np.array([[10, 10, 50, 50]]) * f)


class TestFlipPad:
    def test_flip_boxes(self):
        img = np.arange(12, dtype=np.uint8).reshape(1, 4, 3)[:, :, :3]
        img = np.tile(img, (4, 1, 1))
        t = RandomFlip(flip_ratio=1.0)
        results = dict(img=img, img_shape=(4, 4),
                       gt_bboxes=np.array([[0, 0, 1, 1]], np.float32))
        out = t(results)
        assert out["flip"]
        np.testing.assert_allclose(out["gt_bboxes"], [[2, 0, 3, 1]])

    def test_pad_divisor_and_canvas(self):
        img = np.ones((50, 70, 3), np.float32)
        p = Pad(size=(64, 96), size_divisor=32)
        out = p(dict(img=img))
        assert out["pad_shape"] == (64, 96)
        assert out["img"].shape == (64, 96, 3)
        assert out["img"][:50, :70].sum() == 50 * 70 * 3
        assert out["img"][50:].sum() == 0

    def test_pad_orientation_swap(self):
        img = np.ones((96, 48, 3), np.float32)  # portrait
        p = Pad(size=(64, 128), size_divisor=32)
        out = p(dict(img=img))
        assert out["img"].shape == (128, 64, 3)


class TestFormatting:
    def test_bundle_pads_gt(self):
        b = DefaultFormatBundle(max_gt=5)
        out = b(dict(img=np.zeros((4, 4, 3)),
                     gt_bboxes=np.ones((2, 4), np.float32),
                     gt_labels=np.array([1, 2])))
        assert out["gt_bboxes"].shape == (5, 4)
        assert out["gt_valid"].tolist() == [True, True, False, False, False]

    def test_collect_meta(self):
        c = Collect(keys=["img"])
        out = c(dict(img=np.zeros((4, 4, 3)), ori_shape=(8, 8),
                     img_shape=(4, 4), pad_shape=(4, 4), scale_factor=0.5,
                     flip=False))
        assert out["img_shape"].dtype == np.int32
        assert out["scale_factor"] == np.float32(0.5)


class TestCollateSampler:
    def test_collate_stacks(self):
        samples = [dict(img=np.zeros((4, 4, 3)), idx=np.int32(i))
                   for i in range(3)]
        batch = collate(samples)
        assert batch["img"].shape == (3, 4, 4, 3)
        assert batch["idx"].tolist() == [0, 1, 2]

    def test_group_sampler_orientation(self):
        flags = np.array([0, 0, 0, 1, 1, 1, 1, 1])
        s = GroupedBatchSampler(flags, batch_size=2, shuffle=True, seed=0)
        for batch in s:
            gs = flags[batch]
            assert (gs == gs[0]).all()
            assert len(batch) == 2

    def test_sharding_partitions(self):
        flags = np.zeros(16, np.uint8)
        s0 = list(GroupedBatchSampler(flags, 2, shuffle=False, num_shards=2,
                                      shard_index=0))
        s1 = list(GroupedBatchSampler(flags, 2, shuffle=False, num_shards=2,
                                      shard_index=1))
        all_idx = sorted(i for b in s0 + s1 for i in b)
        assert all_idx == list(range(16))


@pytest.fixture
def synthetic_coco(tmp_path):
    rng = np.random.default_rng(0)
    images, annotations = [], []
    img_dir = tmp_path / "imgs"
    img_dir.mkdir()
    from PIL import Image
    ann_id = 0
    for i in range(4):
        w, h = (80, 60) if i % 2 == 0 else (60, 80)
        arr = rng.integers(0, 255, (h, w, 3), np.uint8)
        Image.fromarray(arr).save(img_dir / f"{i}.jpg")
        images.append(dict(id=i, file_name=f"{i}.jpg", width=w, height=h))
        for _ in range(2):
            x, y = rng.integers(0, w // 2), rng.integers(0, h // 2)
            bw, bh = rng.integers(8, w // 2), rng.integers(8, h // 2)
            annotations.append(dict(id=ann_id, image_id=i,
                                    category_id=int(rng.integers(1, 4)),
                                    bbox=[int(x), int(y), int(bw), int(bh)],
                                    area=int(bw * bh), iscrowd=0))
            ann_id += 1
    cats = [dict(id=c, name=f"c{c}") for c in (1, 2, 3)]
    ann_file = tmp_path / "ann.json"
    ann_file.write_text(json.dumps(dict(
        images=images, annotations=annotations, categories=cats)))
    return str(ann_file), str(img_dir)


class TestCocoDataset:
    def pipeline(self):
        return [
            dict(type="LoadImageFromFile"),
            dict(type="LoadAnnotations", with_bbox=True),
            dict(type="Resize", img_scale=(128, 96), keep_ratio=True),
            dict(type="RandomFlip", flip_ratio=0.5),
            dict(type="Normalize", mean=(0, 0, 0), std=(1, 1, 1), to_rgb=False),
            dict(type="Pad", size_divisor=32, size=(96, 128)),
            dict(type="DefaultFormatBundle", max_gt=10),
            dict(type="Collect", keys=["img", "gt_bboxes", "gt_labels",
                                       "gt_valid"]),
        ]

    def test_round_trip(self, synthetic_coco):
        ann_file, img_dir = synthetic_coco
        ds = build_dataset(dict(type="CocoDataset", ann_file=ann_file,
                                img_prefix=img_dir, pipeline=self.pipeline()))
        assert len(ds) == 4
        assert set(np.unique(ds.flag)) == {0, 1}
        sample = ds[0]
        assert sample["img"].shape in ((96, 128, 3), (128, 96, 3))
        assert sample["gt_bboxes"].shape == (10, 4)
        assert sample["gt_valid"].sum() == 2
        assert sample["gt_labels"].max() <= 3

    def test_labels_one_based(self, synthetic_coco):
        ann_file, img_dir = synthetic_coco
        ds = build_dataset(dict(type="CocoDataset", ann_file=ann_file,
                                img_prefix=img_dir, pipeline=self.pipeline()))
        ann = ds.get_ann_info(0)
        assert ann["labels"].min() >= 1

    def test_loader_batches(self, synthetic_coco):
        ann_file, img_dir = synthetic_coco
        from ioudet.data import build_dataloader
        ds = build_dataset(dict(type="CocoDataset", ann_file=ann_file,
                                img_prefix=img_dir, pipeline=self.pipeline()))
        loader = build_dataloader(ds, imgs_per_gpu=2, workers_per_gpu=1,
                                  shuffle=True, num_shards=1, shard_index=0)
        batches = list(loader)
        assert all(b["img"].ndim == 4 for b in batches)
        # same-orientation batching: every batch has one canvas shape
        for b in batches:
            assert b["img"].shape[1:3] in ((96, 128), (128, 96))
