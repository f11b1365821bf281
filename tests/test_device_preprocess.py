"""Device-preprocess inference path: the jitted resize+normalize+pad must
yield the same detections as the host PIL pipeline on the same image."""

import json
import os

import numpy as np
import pytest


@pytest.fixture(scope="module")
def tiny_handle(tmp_path_factory):
    from PIL import Image
    from ioudet.utils.config import Config
    from ioudet.apis import init_detector

    tmp = tmp_path_factory.mktemp("devprep")
    rng = np.random.default_rng(0)
    arr = rng.integers(0, 255, (60, 90, 3), np.uint8)
    arr[15:40, 20:50] = [250, 10, 10]
    img_path = str(tmp / "img.jpg")
    Image.fromarray(arr).save(img_path)

    cfg = Config.fromdict(dict(
        model=dict(
            type="IoUAwareRetinaNet",
            backbone=dict(type="ResNet", depth=18, frozen_stages=-1,
                          norm_cfg=dict(type="FrozenBN")),
            neck=dict(type="FPN", in_channels=[64, 128, 256, 512],
                      out_channels=32, start_level=1, add_extra_convs=True,
                      num_outs=5),
            bbox_head=dict(type="IoUAwareRetinaHead", num_classes=3,
                           in_channels=32, feat_channels=32, stacked_convs=1,
                           anchor_strides=(8, 16, 32, 64, 128))),
        test_cfg=dict(nms_pre=100, score_thr=0.02, nms=dict(iou_thr=0.5),
                      max_per_img=10, rescoring_alpha=0.5),
        data=dict(test=dict(pipeline=[
            dict(type="LoadImageFromFile"),
            dict(type="Resize", img_scale=(96, 64), keep_ratio=True),
            dict(type="Normalize", mean=(123.675, 116.28, 103.53),
                 std=(58.395, 57.12, 57.375), to_rgb=False),
            dict(type="Pad", size_divisor=32, size=(64, 96)),
            dict(type="Collect", keys=["img"]),
        ])),
    ))
    return init_detector(cfg, None), img_path


class TestDevicePreprocess:
    def test_matches_host_pipeline(self, tiny_handle):
        from ioudet.apis import inference_detector

        handle, img_path = tiny_handle
        r_host = inference_detector(handle, img_path)
        r_dev = inference_detector(handle, img_path, device_preprocess=True)
        # same shapes; top scores agree closely (resize kernels are the
        # same half-pixel bilinear on both paths)
        for a, b in zip(r_host, r_dev):
            assert a.shape == b.shape
        top_host = max((float(d[0, 4]) for d in r_host if len(d)), default=0)
        top_dev = max((float(d[0, 4]) for d in r_dev if len(d)), default=0)
        assert abs(top_host - top_dev) < 0.05


class TestBatchedEvalDevicePreprocess:
    """single_device_test(device_preprocess=True): decode-only host loop +
    fused on-chip resize/normalize/pad must reproduce the host-pipeline
    eval (same detections on a tiny dataset, mixed orientations)."""

    def test_matches_host_eval(self, tmp_path):
        import json
        import numpy as np
        from PIL import Image
        import jax
        import jax.numpy as jnp
        from ioudet.apis import init_detector, single_device_test
        from ioudet.data import build_dataset
        from ioudet.utils.config import Config

        rng = np.random.default_rng(0)
        img_dir = tmp_path / "imgs"
        img_dir.mkdir()
        images, annotations = [], []
        shapes = [(60, 90), (90, 60), (50, 80)]   # mixed orientations
        for i, (h, w) in enumerate(shapes):
            arr = rng.integers(0, 80, (h, w, 3), np.uint8)
            arr[h // 4: h // 2, w // 4: w // 2] = [250, 30, 30]
            Image.fromarray(arr).save(img_dir / f"{i}.png")  # lossless
            images.append(dict(id=i, file_name=f"{i}.png",
                               width=w, height=h))
            annotations.append(dict(id=i, image_id=i, category_id=1,
                                    bbox=[w // 4, h // 4, w // 4, h // 4],
                                    area=w * h / 16, iscrowd=0))
        ann = tmp_path / "ann.json"
        ann.write_text(json.dumps(dict(
            images=images, annotations=annotations,
            categories=[dict(id=1, name="thing")])))

        pipe_test = [
            dict(type="LoadImageFromFile"),
            dict(type="Resize", img_scale=(96, 64), keep_ratio=True),
            dict(type="Normalize", mean=(40.0, 40.0, 40.0),
                 std=(60.0, 60.0, 60.0), to_rgb=True),
            dict(type="Pad", size_divisor=32, size=(64, 96)),
            dict(type="Collect", keys=["img"]),
        ]
        cfg = Config.fromdict(dict(
            model=dict(
                type="IoUAwareRetinaNet",
                backbone=dict(type="ResNet", depth=18, frozen_stages=-1,
                              norm_cfg=dict(type="FrozenBN")),
                neck=dict(type="FPN", in_channels=[64, 128, 256, 512],
                          out_channels=32, start_level=1,
                          add_extra_convs=True, num_outs=5),
                bbox_head=dict(type="IoUAwareRetinaHead", num_classes=3,
                               in_channels=32, feat_channels=32,
                               stacked_convs=1,
                               anchor_strides=(8, 16, 32, 64, 128))),
            test_cfg=dict(nms_pre=100, score_thr=0.02, nms=dict(iou_thr=0.5),
                          max_per_img=10, rescoring_alpha=0.5),
            data=dict(test=dict(type="CocoDataset", ann_file=str(ann),
                                img_prefix=str(img_dir), pipeline=pipe_test,
                                test_mode=True)),
        ))
        handle = init_detector(cfg, None)
        dataset = build_dataset(cfg.data["test"])
        r_host = single_device_test(handle.detector, handle.params, dataset,
                                    imgs_per_batch=2, progress=False)
        r_dev = single_device_test(handle.detector, handle.params, dataset,
                                   imgs_per_batch=2, progress=False,
                                   device_preprocess=True)
        assert len(r_host) == len(r_dev) == 3
        for per_host, per_dev in zip(r_host, r_dev):
            top_h = max((float(d[0, 4]) for d in per_host if len(d)),
                        default=0.0)
            top_d = max((float(d[0, 4]) for d in per_dev if len(d)),
                        default=0.0)
            assert abs(top_h - top_d) < 0.05, (top_h, top_d)
